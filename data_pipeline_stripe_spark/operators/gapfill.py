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
    if "filled" in observed.columns:
        # the output contract claims the name; silently overwriting a
        # caller column is the collision class asof_join was hardened
        # against — fail loudly instead. value == "filled" is rejected
        # too: the select(key, day, value, "filled") contract would emit
        # the same column twice (AMBIGUOUS_REFERENCE downstream) and the
        # raw-observation column would be lost.
        raise ValueError(
            "interpolate_daily: input already has a 'filled' column — "
            "rename it; the output column 'filled' is reserved")
    # internal working columns must not collide with caller columns
    # (same derivation pattern as asof.py / bloom.py temp names)
    taken = set(observed.columns)

    def free(name: str) -> str:
        while name in taken:
            name = "_" + name
        taken.add(name)
        return name

    d0_c, d1_c = free("_d0"), free("_d1")
    l_c, r_c = free("_l"), free("_r")
    t_c, span_c, dv_c = free("_t"), free("_span"), free("_dv")

    bounds = observed.groupBy(key).agg(
        F.min(day).alias(d0_c), F.max(day).alias(d1_c))
    grid = bounds.select(
        key, F.explode(F.sequence(d0_c, d1_c)).alias(day))
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
        .withColumn(l_c, left).withColumn(r_c, right)
        .withColumn(t_c, t.cast("long"))
        .withColumn(span_c, span.cast("long"))
        .withColumn(dv_c, (right["v"] - left["v"]).cast("long"))
        .withColumn(
            "filled",
            F.when(F.col(value).isNotNull(), F.col(value))
            .when(F.col(l_c).isNull() | F.col(r_c).isNull(), F.lit(None))
            .otherwise(
                F.col(l_c)["v"]
                + F.expr(f"`{dv_c}` * `{t_c}` div `{span_c}`")),
        )
        .select(key, day, value, "filled")
    )
    return out
