"""Dense-series gap filling with integer-exact linear interpolation.

`gapfill_user_daily_values` carries the last observation forward
(LOCF); this operator is the other standard completion: each missing
day takes the straight line between its surrounding observations,
computed entirely in integer arithmetic — value deltas are multiplied
out before ONE truncating division, so any engine (and any
partitioning) produces bit-identical fills, per the repo's cross-engine
numeric policy. Endpoints with no left (or right) neighbor stay NULL —
extrapolation is a policy decision, not a default.

Shape: two exchanges of the dense frame — the (key, day) equi-join
hash-partitions on BOTH columns, which does not satisfy the neighbor
windows' per-key clustering, so Spark re-exchanges on key for the
window pass. (A union+window reformulation in the as-of style would
reach one exchange; at the current grain the join form is clearer and
the dense frame is the bounded grid, not the raw fact.) The
interpolation itself is scan-speed expression math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def interpolate_daily(observed: DataFrame, key: str, day: str,
                      value: str) -> DataFrame:
    """``observed``: one row per (key, day) with an integer ``value``
    (quantize first — cents/micros). Returns a DENSE frame over each
    key's [min(day), max(day)] span with:

    - ``value``      — the observation, NULL on gap days;
    - ``filled``     — lerp between the bracketing observations:
      v0 + (v1 - v0) * (t - t0) DIV (t1 - t0)  (truncating division,
      exact in integers; observed days carry their own value).
    """
    bounds = observed.groupBy(key).agg(
        F.min(day).alias("_d0"), F.max(day).alias("_d1"))
    grid = bounds.select(
        key, F.explode(F.sequence("_d0", "_d1")).alias(day))
    joined = grid.join(observed, [key, day], "left")

    wb = (W.partitionBy(key).orderBy(day)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wf = (W.partitionBy(key).orderBy(day)
          .rowsBetween(W.currentRow, W.unboundedFollowing))
    obs_pt = F.when(
        F.col(value).isNotNull(), F.struct(F.col(day).alias("d"),
                                           F.col(value).alias("v")))
    left = F.last(obs_pt, ignorenulls=True).over(wb)
    right = F.first(obs_pt, ignorenulls=True).over(wf)

    t = F.datediff(F.col(day), left["d"])
    span = F.datediff(right["d"], left["d"])
    out = (
        joined
        .withColumn("_l", left).withColumn("_r", right)
        .withColumn("_t", t.cast("long"))
        .withColumn("_span", span.cast("long"))
        .withColumn("_dv", (right["v"] - left["v"]).cast("long"))
        .withColumn(
            "filled",
            F.when(F.col(value).isNotNull(), F.col(value))
            .when(F.col("_l").isNull() | F.col("_r").isNull(), F.lit(None))
            .otherwise(F.col("_l.v") + F.expr("_dv * _t div _span")),
        )
        .select(key, day, value, "filled")
    )
    return out
