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
rows <= 2 × distinct seconds), then the running sum as a TWO-LEVEL
distributed prefix sum (``shard_seconds``, on by default): a parallel
within-shard running sum per (keys, shard), plus each shard's opening
value from a prefix over the per-shard TOTALS — a window over
n_shards rows, not n_points. The naive single-partition global window
is the ``shard_seconds=None`` escape hatch for tiny timelines;
per-key timelines parallelize further for free.

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
                         probes: DataFrame | None = None,
                         shard_seconds: int | None = None) -> DataFrame:
    """Concurrency step function of closed integer-second intervals
    [start_sec, end_sec], per ``keys`` (global if None). Returns
    (keys..., sec, delta, conc): ``conc`` is the number of intervals
    active in [sec, next_sec). ``probes`` (optional, columns keys+sec)
    injects delta-0 readings. Ordering within a second: −1 before 0
    before +1, so a probe at t sees intervals ending at t−1 closed and
    intervals starting at t NOT yet open — and two back-to-back
    intervals [a, t−1], [t, b] never double-count.

    ``shard_seconds`` (opt-in) computes the running sum as a two-level
    distributed prefix sum: within-shard sums run parallel per
    (keys, sec div shard_seconds), and each shard's opening value is a
    prefix over the per-shard totals (n_shards rows). Integer addition
    is associative, so the result is EXACTLY the global running sum —
    the sharding changes the plan, never the answer (pinned by the
    sharded==unsharded test). The two-level form must reference the
    collapsed point set twice (once for in-shard sums, once for shard
    totals); Spark has no DataFrame-branch CSE, so the collapsed frame
    — small by construction, ≤ 2×distinct seconds — is lazily
    localCheckpoint'ed to guarantee the EXPENSIVE upstream (often a
    full sessionization) executes once. Default ``None`` keeps the
    plain single-partition window: right while collapsed points fit
    one task (the ×100 bench: 3.0 s), switch on when they don't."""
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
    if shard_seconds is None:
        base = (W.partitionBy(*part) if part else W.partitionBy())
        run = base.orderBy("sec", "delta").rowsBetween(
            W.unboundedPreceding, W.currentRow)
        return (
            collapsed.withColumn("conc", F.sum("d").over(run).cast("long"))
            .select(*part, "sec", F.col("delta").cast("long"), "conc")
        )
    # two-level distributed prefix sum: parallel within-shard running
    # sums + shard opening values from a prefix over per-shard totals.
    # The lazy checkpoint caps the double branch reference at the tiny
    # collapsed frame — without it the upstream plans twice.
    collapsed = collapsed.localCheckpoint(eager=False)
    shard = free_name([*part, "sec", "delta", "d"], "_shard")
    opening = free_name([*part, shard], "_open")
    shd = collapsed.withColumn(
        shard, F.expr(f"sec div {int(shard_seconds)}"))
    in_shard = (W.partitionBy(*part, shard)
                .orderBy("sec", "delta")
                .rowsBetween(W.unboundedPreceding, W.currentRow))
    shd = shd.withColumn("d", F.sum("d").over(in_shard))
    # per-shard totals = the LAST within-shard running value; opening =
    # prefix over strictly-previous shards (tiny: n_shards rows/key)
    tot_c = free_name([*part, shard, opening], "_tot")
    totals = (shd.groupBy(*part, shard)
              .agg(F.max_by("d", F.struct("sec", "delta")).alias(tot_c)))
    shards_w = ((W.partitionBy(*part) if part else W.partitionBy())
                .orderBy(shard)
                .rowsBetween(W.unboundedPreceding, -1))
    totals = totals.withColumn(
        opening, F.coalesce(F.sum(tot_c).over(shards_w), F.lit(0)))
    return (
        shd.join(totals.select(*part, shard, opening), [*part, shard])
        .select(*part, "sec", F.col("delta").cast("long"),
                (F.col("d") + F.col(opening)).cast("long").alias("conc"))
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
