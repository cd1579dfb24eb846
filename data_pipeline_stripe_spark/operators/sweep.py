"""Sweep-line interval concurrency: given intervals (sessions, rentals,
connections), how many are active at once — the capacity-planning verb
(peak concurrent sessions sizes the fleet). The naive form is an
interval self-join (O(n²) pairs on hot windows); the sweep is
O(n log n): each interval emits +1 at its start second and −1 one
second after its end (closed-interval semantics on the integer second
grid), deltas are pre-aggregated per (second, sign) so ties collapse
deterministically, and one running integer sum over the ordered sweep
points IS the concurrency step function.

Scale shape: one map-side-combinable groupBy to collapse deltas (output
rows <= 2 × distinct seconds), then one window ordered by (second,
delta). The running sum is a single-partition window per group key —
for a GLOBAL timeline at 100 TB, shard by a coarse time range first
(day), carrying each shard's opening concurrency in, exactly like the
probe-row mechanism below; per-key timelines parallelize for free.

Probe rows: a step function only changes at sweep points, so a reading
"what was the concurrency at instant t?" (e.g. midnight, for per-day
peaks that must include sessions spanning the boundary) is a delta-0
point injected at t — it picks up the running value without changing
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ._names import free_name, reject_reserved


def interval_concurrency(intervals: DataFrame, start_sec: str,
                         end_sec: str, keys: list[str] | None = None,
                         probes: DataFrame | None = None) -> DataFrame:
    """Concurrency step function of closed integer-second intervals
    [start_sec, end_sec], per ``keys`` (global if None). Returns
    (keys..., sec, delta, conc): ``conc`` is the number of intervals
    active in [sec, next_sec). ``probes`` (optional, columns keys+sec)
    injects delta-0 readings. Ordering within a second: −1 before 0
    before +1, so a probe at t sees intervals ending at t−1 closed and
    intervals starting at t NOT yet open — and two back-to-back
    intervals [a, t−1], [t, b] never double-count."""
    part = keys or []
    # the output contract claims (sec, delta, conc); a group key by one
    # of those names would silently duplicate/ambiguate downstream
    reject_reserved(part, ["sec", "delta", "conc"], "interval_concurrency")
    p_tmp = free_name([*part, "sec", "delta"], "_p")
    # both endpoints in ONE pass (a union of two selects would plan the
    # upstream intervals subtree — often a full sessionization — twice)
    pts = (
        intervals.select(*part, F.explode(F.array(
            F.struct(F.col(start_sec).cast("long").alias("sec"),
                     F.lit(1).alias("delta")),
            F.struct((F.col(end_sec).cast("long") + 1).alias("sec"),
                     F.lit(-1).alias("delta")),
        )).alias(p_tmp))
        .select(*part, F.col(f"{p_tmp}.sec").alias("sec"),
                F.col(f"{p_tmp}.delta").alias("delta"))
    )
    if probes is not None:
        pts = pts.unionByName(
            probes.select(*part, F.col("sec").cast("long"),
                          F.lit(0).alias("delta")))
    collapsed = (pts.groupBy(*part, "sec", "delta")
                    .agg(F.sum("delta").cast("long").alias("d")))
    base = (W.partitionBy(*part) if part else W.partitionBy())
    run = base.orderBy("sec", "delta").rowsBetween(
        W.unboundedPreceding, W.currentRow)
    return (
        collapsed.withColumn("conc", F.sum("d").over(run).cast("long"))
        .select(*part, "sec", F.col("delta").cast("long"), "conc")
    )


def interval_concurrency_oracle_sql(intervals: str, start_sec: str,
                                    end_sec: str,
                                    probes: str | None = None,
                                    keys: str | None = None) -> str:
    """DuckDB transcription of ``interval_concurrency`` (same collapse
    + ordered running sum). ``intervals``/``probes`` are relations."""
    part = f"PARTITION BY {keys} " if keys else ""
    kcols = f"{keys}, " if keys else ""
    probe_union = (
        f"UNION ALL SELECT {kcols}CAST(sec AS BIGINT) AS sec, "
        f"0 AS delta FROM ({probes})" if probes else "")
    return f"""
    WITH pts AS (
        SELECT {kcols}CAST({start_sec} AS BIGINT) AS sec, 1 AS delta
        FROM ({intervals})
        UNION ALL
        SELECT {kcols}CAST({end_sec} AS BIGINT) + 1 AS sec, -1 AS delta
        FROM ({intervals})
        {probe_union}
    ), collapsed AS (
        SELECT {kcols}sec, delta, CAST(SUM(delta) AS BIGINT) AS d
        FROM pts GROUP BY ALL
    )
    SELECT {kcols}sec, CAST(delta AS BIGINT) AS delta,
           CAST(SUM(d) OVER ({part}ORDER BY sec, delta
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS conc
    FROM collapsed
    """
