"""Gated table-maintenance and governance queries: the operational verbs
a 100 TB lake runs around its analytics — declarative quality gates,
clustered layout with z-pruned reads, small-file compaction + partition
retention, dense-series interpolation, and weighted sampling — each
hash-checked against a DuckDB transcription oracle.

Round-trip queries write REAL files under .scratch/ (same pattern as
io_roundtrip.py): the hash gate then verifies the whole
write→maintain→read path, not just a transform.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..sources.readers import inline_dim
from .io_roundtrip import _scratch, frames_differ
from .registry import query


# ---------------------------------------------------------------------------
# Quality gate: the declarative expectation suite (operators/quality.py)
# as a driver-gated report.
# ---------------------------------------------------------------------------
@query(
    "quality_gate_orders_report",
    oracle="""
    SELECT 'not_null(o_custkey)' AS "check",
           CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS violations,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM orders
    UNION ALL
    SELECT 'in_range(o_totalprice,0,300000)',
           CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NULL
                                    OR o_totalprice < 0
                                    OR o_totalprice > 300000
                                  THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'accepted_values(o_orderstatus)',
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus IS NULL
                                    OR o_orderstatus NOT IN ('O', 'F')
                                  THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'matches_regex(o_orderpriority)',
           CAST(COALESCE(SUM(CASE WHEN o_orderpriority IS NULL
                                    OR NOT regexp_matches(o_orderpriority,
                                                          '^[1-3]-')
                                  THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)',
           CAST(COALESCE((SELECT SUM(n) FROM (
               SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey
               HAVING COUNT(*) > 1)), 0) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'foreign_key(o_custkey->c_custkey)',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    """,
)
def quality_gate_orders_report(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The declarative quality gate (operators/quality.py:run_checks) in
    the driver's hash gate: six constraints over orders — four row-level
    checks compiled into ONE aggregate over ONE scan, uniqueness as its
    one keyed exchange, referential integrity as a broadcast anti-join
    against customer. The oracle's UNION ALL of six selects is the
    TRANSCRIPTION of the report contract, not the plan (the engine runs
    3 jobs, not 6 scans — plan pinned in tests/test_operators.py).
    Bounds are chosen so the fixture produces real non-zero violation
    counts (totalprice > 300000 rows, 'P' status rows, priority 4/5
    rows), so a broken predicate cannot hide behind all-zeros."""
    from ..operators.quality import (accepted_values, foreign_key, in_range,
                                     matches_regex, not_null, run_checks,
                                     unique)

    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    customer = load_table(spark, sf_dir, "customer")
    return run_checks(orders, [
        not_null("o_custkey"),
        in_range("o_totalprice", 0, 300000),
        accepted_values("o_orderstatus", ["O", "F"]),
        matches_regex("o_orderpriority", "^[1-3]-"),
        unique("o_orderkey"),
        foreign_key("o_custkey", customer, "c_custkey"),
    ])


# ---------------------------------------------------------------------------
# Clustered write → z-pruned read round trip.
# ---------------------------------------------------------------------------
_X_SPARK = ("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1995-01-01') "
            "AS BIGINT)")
_Y_SPARK = "CAST(o_custkey AS BIGINT) & 65535"
_RECT = (0, 365, 16, 127)  # x (order-day number) range, y (masked custkey)


@query(
    "zorder_clustered_roundtrip",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day
    FROM orders
    WHERE date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
          BETWEEN {_RECT[0]} AND {_RECT[1]}
      AND (CAST(o_custkey AS BIGINT) & 65535)
          BETWEEN {_RECT[2]} AND {_RECT[3]}
    """,
)
def zorder_clustered_roundtrip(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The full z-clustering story as one gated round trip: compute the
    Morton key (zorder_key_orders' expression), WRITE the table
    clustered on it (write_clustered: range partitioning → disjoint key
    spans per file, sorted within), then READ it back through the
    z-interval rectangle filter (z_rectangle_filter: quadtree cell
    cover → BETWEEN disjunction pushed to the scan + exact residual).
    The hash match against the plain rectangle SQL proves the cover is
    sound and exact at full budget ACROSS the write→read boundary; the
    file-pruning effectiveness of the same layout is pinned separately
    (tests/test_scale_patterns.py reads parquet footers)."""
    from ..operators.layout import write_clustered
    from ..operators.zorder import z_rectangle_filter
    from .relational5 import _Z_SPARK

    out = _scratch(sf_dir, "zorder_clustered")
    orders = load_table(spark, sf_dir, "orders", rebalance=False).select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.expr(f"CAST({_Z_SPARK} AS BIGINT)").alias("zkey"),
    )
    write_clustered(orders, out, ["zkey"], n_files=16)

    back = spark.read.parquet(out)
    x_lo, x_hi, y_lo, y_hi = _RECT
    pred = z_rectangle_filter(
        "zkey", F.expr(_X_SPARK), F.expr(_Y_SPARK),
        x_lo, x_hi, y_lo, y_hi,
    )
    return back.filter(pred).select(
        "o_orderkey", "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
    )


# ---------------------------------------------------------------------------
# Compaction + retention maintenance round trip.
# ---------------------------------------------------------------------------
_VACUUM_CUTOFF = "2024-01-08"


@query(
    "maintenance_compact_vacuum_roundtrip",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS event_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') >= '{_VACUUM_CUTOFF}'
    GROUP BY 1
    """,
)
def maintenance_compact_vacuum_roundtrip(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    """The two table-maintenance verbs composed, gated end to end:
    events land as a day-partitioned table with deliberately fragmented
    files (4 per partition — the streaming-ingest shape), retention
    DELETES the expired day partitions (vacuum_partitions: O(deleted)
    directory removes, no survivor rewrite), compaction rewrites the
    survivors to size-targeted files (compact_small_files), and the
    query aggregates the compacted table. The hash matches the oracle's
    date-filtered aggregate over the ORIGINAL events only if the vacuum
    deleted exactly the expired partitions and compaction preserved
    every surviving row and partition value. Partition values come back
    as strings (partition-type inference is disabled on the re-read —
    the repo's known DATE-inference trap)."""
    from ..operators.layout import compact_small_files, vacuum_partitions

    scratch = _scratch(sf_dir, "maintenance_roundtrip")
    table_dir = os.path.join(scratch, "table")
    compact_dir = os.path.join(scratch, "compacted")

    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_id", "user_id",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
    )
    (
        ev.repartition(4)  # fragment: 4 files per day partition
        .write.mode("overwrite").partitionBy("event_day").parquet(table_dir)
    )
    vacuum_partitions(table_dir, "event_day",
                      keep=lambda day: day >= _VACUUM_CUTOFF)
    conf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        compact_small_files(spark, table_dir, compact_dir,
                            target_file_bytes=1 << 20)
        back = spark.read.parquet(compact_dir)
    finally:
        spark.conf.set(conf_key, prev)
    return back.groupBy(F.col("event_day").cast("string").alias("event_day")).agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents").alias("value_cents"),
    )


# ---------------------------------------------------------------------------
# Dense-series linear interpolation (integer lerp), gated.
# ---------------------------------------------------------------------------
@query(
    "gapfill_user_daily_lerp",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS day_cents
        FROM events WHERE user_id < 30 GROUP BY 1, 2
    ), span AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), grid AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM span
    ), j AS (
        SELECT g.user_id, g.day, d.day_cents
        FROM grid g LEFT JOIN daily d
          ON g.user_id = d.user_id AND g.day = d.day
    ), br AS (
        SELECT user_id, day, day_cents,
               LAST_VALUE(CASE WHEN day_cents IS NOT NULL
                               THEN {'d': day, 'v': day_cents}
                          END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS l,
               FIRST_VALUE(CASE WHEN day_cents IS NOT NULL
                                THEN {'d': day, 'v': day_cents}
                           END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS r
        FROM j
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           day_cents,
           CAST(CASE
               WHEN day_cents IS NOT NULL THEN day_cents
               WHEN l IS NULL OR r IS NULL THEN NULL
               ELSE l['v'] + CASE
                   WHEN (r['v'] - l['v'])
                        * date_diff('day', l['d'], day) >= 0
                   THEN ((r['v'] - l['v'])
                         * date_diff('day', l['d'], day))
                        // date_diff('day', l['d'], r['d'])
                   ELSE -((-((r['v'] - l['v'])
                             * date_diff('day', l['d'], day)))
                          // date_diff('day', l['d'], r['d']))
               END
           END AS BIGINT) AS filled
    FROM br
    """,
)
def gapfill_user_daily_lerp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series with integer-exact LINEAR interpolation
    (operators/gapfill.py:interpolate_daily) — the lerp companion to
    gapfill_user_daily_values' LOCF: each gap day takes
    v0 + (v1-v0)·(t-t0) DIV (t1-t0) between its bracketing
    observations, truncating toward zero on BOTH engines (the oracle
    wraps DuckDB's flooring // in a sign split); endpoints with a
    missing neighbor stay NULL. Restricted to users < 30 to bound the
    gate's dense grid; the operator itself is per-key parallel at any
    scale (two exchanges, see gapfill.py docstring)."""
    from ..operators.gapfill import interpolate_daily

    ev = load_table(spark, sf_dir, "events", rebalance=False).filter(F.col("user_id") < 30)
    daily = (
        ev.groupBy(
            "user_id", F.col("ts").cast("date").alias("day")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long"))
             .alias("day_cents"))
    )
    out = interpolate_daily(daily, "user_id", "day", "day_cents")
    return out.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "day_cents",
        F.col("filled").cast("long").alias("filled"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling: systematic PPS (probability proportional to size).
# ---------------------------------------------------------------------------
_PPS_K = 20


@query(
    "events_weighted_sample_pps",
    oracle=f"""
    WITH w AS (
        SELECT event_type, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS wt,
               md5(CAST(event_id AS VARCHAR)) AS shuf
        FROM events
    ), c AS (
        SELECT event_type, event_id, wt,
               SUM(wt) OVER (PARTITION BY event_type
                             ORDER BY shuf, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum,
               SUM(wt) OVER (PARTITION BY event_type) AS tot
        FROM w
    )
    SELECT event_type, event_id, wt AS weight_cents
    FROM c
    WHERE tot > 0
      AND (cum * {_PPS_K}) // tot > ((cum - wt) * {_PPS_K}) // tot
    """,
)
def events_weighted_sample_pps(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Weighted sampling that is DETERMINISTIC and cross-engine exact:
    systematic probability-proportional-to-size selection per stratum.
    Rows are laid on the cumulative-weight line in md5-shuffled order
    (reproducible, unbiased w.r.t. any data ordering) and one sample is
    taken per 1/k-th of each stratum's total weight — a row is selected
    iff its weight interval contains a grid point, i.e.
    floor(cum·k/tot) > floor((cum−w)·k/tot). Pure integer arithmetic
    (weights are cents; cum·k < 2^63), so selection is bit-identical on
    any engine — the practical stand-in for A-ES exponential sampling,
    whose u^(1/w) priorities have no cross-engine-exact formulation.
    Inclusion probability ≈ k·w/tot (exact for w ≤ tot/k; heavier rows
    are simply always included — the standard PPS guarantee).

    Scale shape: the cumulative sum is a per-stratum window (parallel
    across strata); a single global stratum at 100 TB becomes the
    classic two-pass distributed prefix sum (per-partition totals
    broadcast as offsets). Returns ≈k rows per stratum."""
    ev = load_table(spark, sf_dir, "events", rebalance=False)
    from pyspark.sql.window import Window as W

    w = ev.select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("wt"),
        F.md5(F.col("event_id").cast("string")).alias("shuf"),
    )
    cum_w = (
        W.partitionBy("event_type").orderBy("shuf", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot_w = W.partitionBy("event_type")
    c = w.select(
        "event_type", "event_id", "wt",
        F.sum("wt").over(cum_w).alias("cum"),
        F.sum("wt").over(tot_w).alias("tot"),
    )
    # tot > 0 guard on BOTH sides: an all-zero-weight stratum would make
    # Spark's `div` yield NULL (filtered) but DuckDB's `//` raise —
    # engine-asymmetric without the guard
    sel = (F.col("tot") > 0) & (
        F.expr(f"(cum * {_PPS_K}) div tot")
        > F.expr(f"((cum - wt) * {_PPS_K}) div tot")
    )
    return c.filter(sel).select(
        "event_type", "event_id", F.col("wt").alias("weight_cents")
    )


# ---------------------------------------------------------------------------
# Snapshot-based CDC derivation (the inverse of apply_cdc).
# ---------------------------------------------------------------------------
@query(
    "cdc_snapshot_diff_orders",
    oracle="""
    WITH old AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
               CAST(CONCAT('0x', substring(
                   md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100
                   AS bk
        FROM orders
    ), new AS (
        SELECT o_orderkey,
               CASE WHEN bk < 20 THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus,
               price_cents
        FROM old WHERE bk >= 10
        UNION ALL
        -- inserted keys live in the NEGATIVE namespace: disjoint from
        -- real (non-negative) order keys at ANY scale factor, unlike a
        -- fixed additive offset which collides once keys grow past it
        SELECT -o_orderkey - 1, 'N', price_cents
        FROM old WHERE bk >= 90
    )
    SELECT 'I' AS op, n.o_orderkey, n.o_orderstatus, n.price_cents
    FROM new n WHERE n.o_orderkey NOT IN (SELECT o_orderkey FROM old)
    UNION ALL
    SELECT 'D', o.o_orderkey, o.o_orderstatus, o.price_cents
    FROM old o WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM new)
    UNION ALL
    SELECT 'U', n.o_orderkey, n.o_orderstatus, n.price_cents
    FROM new n JOIN old o USING (o_orderkey)
    WHERE n.o_orderstatus IS DISTINCT FROM o.o_orderstatus
       OR n.price_cents IS DISTINCT FROM o.price_cents
    """,
)
def cdc_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-based CDC derivation (operators/merge.py:snapshot_diff)
    in the gate: a deterministic 'new' snapshot is built from orders
    (md5-bucket rule: buckets <10 deleted, 10–19 status-updated to 'X',
    ≥90 re-inserted under negated keys — a namespace disjoint from real
    keys at any SF), and the diff must classify
    every key as exactly the I/U/D the construction implies — the
    full-outer join + NULL-safe struct comparison against a plain SQL
    set-difference transcription. The apply_cdc round trip (diff
    replayed onto old == new) is pinned in tests/test_operators.py;
    output size is the churn, never the table."""
    from ..operators.merge import snapshot_diff

    old = load_table(spark, sf_dir, "orders", rebalance=False).select(
        "o_orderkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long")
        .alias("price_cents"),
        (F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
                16, 10).cast("long") % 100).alias("bk"),
    )
    new = (
        old.filter(F.col("bk") >= 10)
        .select(
            "o_orderkey",
            F.when(F.col("bk") < 20, "X").otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            "price_cents",
        )
        .unionByName(
            old.filter(F.col("bk") >= 90).select(
                (-F.col("o_orderkey") - 1).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                "price_cents",
            )
        )
    )
    return snapshot_diff(old.drop("bk"), new, "o_orderkey")


# ---------------------------------------------------------------------------
# Bucketed co-located join round trip.
# ---------------------------------------------------------------------------
@query(
    "bucketed_join_roundtrip",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS price_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join, gated through the CATALOG: lineitem and
    orders are written `bucketBy(8, key).sortBy(key)` as warehouse
    tables, re-read via spark.table, joined on the bucket key, and
    aggregated — the hash must match the plain join over the original
    parquet, proving the bucketed write/read loses nothing and the
    bucket-pruned join matches unbucketed semantics. The 100 TB point —
    the co-located join needs NO Exchange on either side — is pinned
    separately with broadcast disabled
    (tests/test_scale_patterns.py::test_bucketed_join_needs_no_shuffle);
    this query pins the correctness half in the driver ledger. Tables
    are per-SF-named and overwritten each run (left for the driver's
    collect — a gated fn must not drop tables its returned frame still
    reads); `write_bucketed_table` clears orphaned warehouse locations
    from previous sessions (the LOCATION_ALREADY_EXISTS trap)."""
    from ..operators.layout import write_bucketed_table

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    li_t, o_t = f"bjr_lineitem_{tag}", f"bjr_orders_{tag}"
    li = load_table(spark, sf_dir, "lineitem", rebalance=False).select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long")
        .alias("price_cents"),
    )
    orders = load_table(spark, sf_dir, "orders", rebalance=False).select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed_table(spark, li, li_t, "l_orderkey")
    write_bucketed_table(spark, orders, o_t, "o_orderkey")
    lb, ob = spark.table(li_t), spark.table(o_t)
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("price_cents").alias("price_cents"),
        )
    )


_BACKFILL_DAY = "2024-01-10"


@query(
    "backfill_partition_overwrite_roundtrip",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS event_day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                    * CASE WHEN strftime(ts, '%Y-%m-%d') = '{_BACKFILL_DAY}'
                           THEN 2 ELSE 1 END) AS BIGINT) AS value_cents
    FROM events
    WHERE NOT (strftime(ts, '%Y-%m-%d') = '{_BACKFILL_DAY}'
               AND event_type = 'error')
    GROUP BY 1, 2
    """,
)
def backfill_partition_overwrite_roundtrip(spark: SparkSession,
                                           sf_dir: str) -> DataFrame:
    """Idempotent single-partition backfill — the correction verb every
    partitioned lake runs weekly: events land day-partitioned, then ONE
    day's data is re-derived (here: its 'error' rows dropped and its
    values doubled — a stand-in for any upstream fix) and written with
    ``partitionOverwriteMode=dynamic`` + ``mode('overwrite')``, which
    replaces exactly the partitions present in the written frame.

    The hash gate proves both halves: the corrected day matches the
    oracle's CASE-corrected aggregate (the backfill landed, once —
    doubled values would double again on a non-idempotent append), and
    every OTHER day matches the original fixture (STATIC overwrite —
    the default — would have wiped all 29 sibling partitions; their
    rows vanishing is an instant row-count mismatch). Conf is
    save/restored around the write; partition values re-read as strings
    (the DATE-inference trap)."""
    scratch = _scratch(sf_dir, "backfill_overwrite")
    table_dir = os.path.join(scratch, "table")

    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_id", "user_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
    )
    ev.write.mode("overwrite").partitionBy("event_day").parquet(table_dir)

    corrected = (
        ev.filter(F.col("event_day") == _BACKFILL_DAY)
        .filter(F.col("event_type") != "error")
        .withColumn("value_cents", F.col("value_cents") * 2)
    )
    conf = spark.conf
    ov_key = "spark.sql.sources.partitionOverwriteMode"
    inf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev_ov, prev_inf = conf.get(ov_key, "STATIC"), conf.get(inf_key, "true")
    conf.set(ov_key, "dynamic")
    conf.set(inf_key, "false")
    try:
        (
            corrected.write.mode("overwrite")
            .partitionBy("event_day").parquet(table_dir)
        )
        back = spark.read.parquet(table_dir)
    finally:
        conf.set(ov_key, prev_ov)
        conf.set(inf_key, prev_inf)
    return back.groupBy(
        F.col("event_day").cast("string").alias("event_day"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents").alias("value_cents"),
    )


_SNAP_C1, _SNAP_C2 = "2024-01-11", "2024-01-21"


@query(
    "snapshot_time_travel_roundtrip",
    oracle=f"""
    WITH base AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
    ),
    v0 AS (SELECT * FROM base WHERE day < '{_SNAP_C1}'),
    v1 AS (SELECT * FROM base WHERE day < '{_SNAP_C2}'),
    v2 AS (SELECT * FROM v1 WHERE event_type <> 'error')
    SELECT CAST(0 AS BIGINT) AS version, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(c) AS BIGINT) AS cents
    FROM v0 GROUP BY 2
    UNION ALL
    SELECT CAST(1 AS BIGINT), event_type,
           CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT)
    FROM v1 GROUP BY 2
    UNION ALL
    SELECT CAST(2 AS BIGINT), event_type,
           CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT)
    FROM v2 GROUP BY 2
    """,
)
def snapshot_time_travel_roundtrip(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Snapshot-table commit protocol in the hash gate
    (operators/snapshots.py — the Iceberg core hand-built on raw
    parquet: immutable data files + immutable manifests published with
    an atomic put-if-absent, so publication IS the commit and racing
    writers rebase instead of clobbering). Three commits build three
    versions:

    - v0 APPEND: events before {c1};
    - v1 APPEND: events in [{c1}, {c2}) — v0's files are REFERENCED,
      not rewritten (O(new-data) commit);
    - v2 OVERWRITE: the CURRENT state re-read through the table itself
      and cleaned (errors dropped) — the compaction/GDPR-rewrite verb;
      v0/v1 stay time-travelable.

    The returned frame reads ALL THREE versions back via time travel
    and aggregates each; the hash matches only if every historical
    state is byte-equivalent to its independently reconstructed oracle
    twin — a commit that tore, an append that rewrote or dropped prior
    files, an overwrite that leaked old rows into the new version, or
    a time-travel read that resolved the wrong manifest each flips a
    row. Atomicity/expiry mechanics (pointer swap, orphan collection,
    keep_last floor) are pytest-pinned in test_operators.py."""
    from ..operators.snapshots import snapshot_commit, snapshot_read

    table_dir = _scratch(sf_dir, "snapshot_table")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    snapshot_commit(spark, table_dir, ev.filter(F.col("day") < _SNAP_C1),
                    mode="append")
    snapshot_commit(
        spark, table_dir,
        ev.filter((F.col("day") >= _SNAP_C1) & (F.col("day") < _SNAP_C2)),
        mode="append")
    cleaned = snapshot_read(spark, table_dir).filter(
        F.col("event_type") != "error")
    snapshot_commit(spark, table_dir, cleaned, mode="overwrite")

    views = []
    for v in (0, 1, 2):
        views.append(
            snapshot_read(spark, table_dir, version=v)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"), F.sum("c").alias("cents"))
            .select(F.lit(v).cast("long").alias("version"), "event_type",
                    "n_events", "cents")
        )
    out = views[0]
    for extra in views[1:]:
        out = out.unionByName(extra)
    return out


# ---------------------------------------------------------------------------
# Snapshot format round 9: optimistic concurrency, stats-pruned scans,
# incremental (CDF-style) reads — the three verbs VERDICT r8 named as the
# remaining gap between "commit protocol proven" and "a table format a
# 100 TB multi-job deployment could actually run on".
# ---------------------------------------------------------------------------
@query(
    "snapshot_concurrent_commit_parity",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY 1
    """,
)
def snapshot_concurrent_commit_parity(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Optimistic concurrency in the hash gate: TWO writer threads,
    started on a barrier, each commit 4 disjoint slices of events
    (slice = pmod(event_id, 8)) into ONE snapshot table concurrently.
    Every commit must win a version (the put-if-absent publication
    makes racing appends rebase instead of clobbering —
    operators/snapshots.py), so the final table is the exact union of
    all 8 slices: a single lost update flips the per-type counts and
    cent sums against the whole-events oracle. The query additionally
    raises if the version chain is not exactly 0..7 or if either
    writer errored — a silent swallow can't fake a pass."""
    import threading

    from ..operators.snapshots import (snapshot_commit, snapshot_read,
                                       snapshot_versions)

    table_dir = _scratch(sf_dir, "snapshot_concurrent")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.pmod(F.col("event_id"), F.lit(8)).alias("slot"),
    )
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def writer(slots: range) -> None:
        try:
            barrier.wait()
            for s in slots:
                snapshot_commit(
                    spark, table_dir,
                    ev.filter(F.col("slot") == s).drop("slot"),
                    mode="append")
        except Exception as exc:  # surfaced below, never swallowed
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(r,))
               for r in (range(0, 4), range(4, 8))]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    if errors:
        raise RuntimeError(
            "snapshot_concurrent_commit_parity: a writer failed"
        ) from errors[0]
    versions = snapshot_versions(table_dir)
    if versions != list(range(8)):
        raise RuntimeError(
            f"snapshot_concurrent_commit_parity: expected versions 0..7, "
            f"got {versions} — a concurrent commit was lost or skipped")
    return (
        snapshot_read(spark, table_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("cents").alias("cents"))
    )


_PRUNE_CUT = "2024-01-22"


@query(
    "snapshot_stats_pruned_read",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') >= '{_PRUNE_CUT}'
    GROUP BY 1
    """,
)
def snapshot_stats_pruned_read(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Manifest-level file pruning in the hash gate: four appends fill
    a snapshot table with disjoint day ranges, so every data file's
    parquet-footer min/max for ``day`` (harvested into the manifest at
    commit time — operators/snapshots.py) covers only its commit's
    range. ``snapshot_scan(day >= cut)`` must then plan ONLY the last
    commit's files — the query raises unless the planned file count is
    strictly below the table's total (pruning demonstrably happened,
    mirroring the z-order gate's style) — and the pruned+filtered
    result must hash-equal the plain predicate applied to the whole
    events table. One level above parquet row-group pruning: files the
    stats exclude are never even handed to Spark's planner."""
    from ..operators.snapshots import (snapshot_commit,
                                       snapshot_pruned_files,
                                       snapshot_scan)

    table_dir = _scratch(sf_dir, "snapshot_pruned")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cuts = ["2024-01-08", "2024-01-15", _PRUNE_CUT]
    bands = [
        F.col("day") < cuts[0],
        (F.col("day") >= cuts[0]) & (F.col("day") < cuts[1]),
        (F.col("day") >= cuts[1]) & (F.col("day") < cuts[2]),
        F.col("day") >= cuts[2],
    ]
    for band in bands:
        snapshot_commit(spark, table_dir, ev.filter(band), mode="append")

    kept, total = snapshot_pruned_files(
        table_dir, [("day", ">=", _PRUNE_CUT)])
    if not kept or len(kept) >= total:
        raise RuntimeError(
            f"snapshot_stats_pruned_read: expected the day-range stats "
            f"to prune files ({len(kept)}/{total} planned) — manifest "
            "stats are missing or the pruning predicate is broken")
    return (
        snapshot_scan(spark, table_dir, [("day", ">=", _PRUNE_CUT)])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("cents").alias("cents"))
    )


@query(
    "snapshot_incremental_read_parity",
    oracle=f"""
    WITH base AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
    ),
    agg_full AS (
        SELECT 'full' AS section, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(c) AS BIGINT) AS cents
        FROM base GROUP BY 2
    ),
    agg_replay AS (
        SELECT 'base_plus_delta' AS section, event_type,
               CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT)
        FROM base GROUP BY 2
    ),
    agg_delta AS (
        SELECT 'delta_only' AS section, event_type,
               CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT)
        FROM base WHERE day >= '{_SNAP_C1}' GROUP BY 2
    )
    SELECT * FROM agg_full
    UNION ALL SELECT * FROM agg_replay
    UNION ALL SELECT * FROM agg_delta
    """,
)
def snapshot_incremental_read_parity(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Incremental (CDF-style) source reads in the hash gate: three
    appends build the table (days < c1, [c1, c2), >= c2);
    ``snapshot_read_incremental(from=0)`` walks the manifest parent
    chain and returns EXACTLY the rows versions 1..2 added, without
    rescanning the base — the base+delta pattern an incremental
    downstream consumer runs instead of full-table rescans. Three
    gated sections: ``full`` (plain read of the head version),
    ``base_plus_delta`` (version-0 read unioned with the incremental
    delta — must equal ``full`` row-for-row, which the oracle enforces
    by aggregating the same whole-table twice), and ``delta_only``
    (the incremental frame alone vs the explicit day predicate — a
    delta that leaked base rows or dropped appended ones flips it)."""
    from ..operators.snapshots import (snapshot_commit, snapshot_read,
                                       snapshot_read_incremental)

    table_dir = _scratch(sf_dir, "snapshot_incremental")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    snapshot_commit(spark, table_dir, ev.filter(F.col("day") < _SNAP_C1),
                    mode="append")
    snapshot_commit(
        spark, table_dir,
        ev.filter((F.col("day") >= _SNAP_C1) & (F.col("day") < _SNAP_C2)),
        mode="append")
    snapshot_commit(spark, table_dir, ev.filter(F.col("day") >= _SNAP_C2),
                    mode="append")

    delta = snapshot_read_incremental(spark, table_dir, 0)
    base = snapshot_read(spark, table_dir, version=0)
    full = snapshot_read(spark, table_dir)

    def agg(df: DataFrame, section: str) -> DataFrame:
        return (
            df.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("c").alias("cents"))
            .select(F.lit(section).alias("section"), "event_type",
                    "n_events", "cents")
        )

    return (
        agg(full, "full")
        .unionByName(agg(base.unionByName(delta), "base_plus_delta"))
        .unionByName(agg(delta, "delta_only"))
    )


@query(
    "snapshot_schema_evolution_parity",
    oracle=f"""
    WITH base AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
    ),
    head AS (
        SELECT 'head' AS section, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(c) AS BIGINT) AS cents,
               CAST(SUM(CASE WHEN day >= '{_SNAP_C1}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS with_day,
               CAST(SUM(CASE WHEN day >= '{_SNAP_C2}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS with_src
        FROM base GROUP BY 2
    ),
    v0 AS (
        SELECT 'v0' AS section, event_type,
               CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        FROM base WHERE day < '{_SNAP_C1}' GROUP BY 2
    )
    SELECT * FROM head UNION ALL SELECT * FROM v0
    """,
)
def snapshot_schema_evolution_parity(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Additive schema evolution in the hash gate: three appends with
    WIDENING schemas — v0 (event_type, c), v1 adds ``day``, v2 adds
    ``src`` (and reorders columns) — build one table. The HEAD read
    serves every file under the evolved union schema
    (operators/snapshots.py:_evolved_schema_json /_read_entries):
    rows from files written before a column existed read it as NULL,
    so ``with_day``/``with_src`` non-null counts match the exact day
    ranges each column was introduced at — a read that dropped old
    files, misfilled the added columns, or leaked the union into
    history flips a row. The ``v0`` section proves time travel keeps
    the ORIGINAL two-column schema (the query raises on any other
    column set, then pads the shape literally, mirroring the oracle's
    zero literals)."""
    from ..operators.snapshots import snapshot_commit, snapshot_read

    table_dir = _scratch(sf_dir, "snapshot_evolution")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    snapshot_commit(spark, table_dir,
                    ev.filter(F.col("day") < _SNAP_C1)
                    .select("event_type", "c"),
                    mode="append")
    snapshot_commit(
        spark, table_dir,
        ev.filter((F.col("day") >= _SNAP_C1) & (F.col("day") < _SNAP_C2))
        .select("event_type", "c", "day"),
        mode="append")
    snapshot_commit(
        spark, table_dir,
        ev.filter(F.col("day") >= _SNAP_C2)
        .select("event_type", "day", F.lit("late").alias("src"), "c"),
        mode="append")

    head = snapshot_read(spark, table_dir)
    if sorted(head.columns) != ["c", "day", "event_type", "src"]:
        raise RuntimeError(
            f"snapshot_schema_evolution_parity: evolved union schema "
            f"wrong: {head.columns}")
    head_agg = (
        head.groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("c").alias("cents"),
             F.count("day").alias("with_day"),
             F.count("src").alias("with_src"))
        .select(F.lit("head").alias("section"), "event_type",
                "n_events", "cents",
                F.col("with_day").cast("long").alias("with_day"),
                F.col("with_src").cast("long").alias("with_src"))
    )
    v0 = snapshot_read(spark, table_dir, version=0)
    if v0.columns != ["event_type", "c"]:
        raise RuntimeError(
            f"snapshot_schema_evolution_parity: v0 schema leaked the "
            f"evolution: {v0.columns}")
    v0_agg = (
        v0.groupBy("event_type")
        .agg(F.count("*").alias("n_events"), F.sum("c").alias("cents"))
        .select(F.lit("v0").alias("section"), "event_type",
                "n_events", "cents",
                F.lit(0).cast("long").alias("with_day"),
                F.lit(0).cast("long").alias("with_src"))
    )
    return head_agg.unionByName(v0_agg)


@query(
    "snapshot_merge_upsert_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 600
    ),
    upd AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) * 2 AS BIGINT) AS cents
        FROM orders WHERE o_orderkey > 300 AND o_orderkey <= 900
    )
    SELECT COALESCE(u.k, b.k) AS o_orderkey,
           COALESCE(u.pri, b.pri) AS pri,
           COALESCE(u.cents, b.cents) AS cents,
           CASE WHEN u.k IS NOT NULL AND b.k IS NOT NULL THEN 'updated'
                WHEN u.k IS NOT NULL THEN 'inserted'
                ELSE 'kept' END AS merge_action
    FROM base b FULL OUTER JOIN upd u ON b.k = u.k
    """,
)
def snapshot_merge_upsert_parity(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Transactional MERGE INTO the snapshot table
    (operators/snapshots.py:snapshot_merge): the base commit holds
    orders <= 600, the update batch doubles cents for (300, 900] —
    overlapping keys take the full-row UPDATE, new keys INSERT, the
    rest pass through as kept — and the merged state is committed as
    an overwrite VALIDATED against the version the merge read
    (expected_version), so a concurrent commit cannot be silently
    dropped (pytest pins the conflict branch with an interleaved
    writer; here the hash gates the merge semantics end-to-end through
    the table: the returned frame is re-read FROM the committed
    version, not the in-memory merge result). Row-level output keyed
    on o_orderkey with the merge_action audit column — any wrong
    action class, lost base row, or doubled update flips the hash."""
    from ..operators.snapshots import (snapshot_commit, snapshot_merge,
                                       snapshot_read)

    table_dir = _scratch(sf_dir, "snapshot_merge")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    base = orders.filter(F.col("o_orderkey") <= 600).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    upd = orders.filter(
        (F.col("o_orderkey") > 300) & (F.col("o_orderkey") <= 900)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        (F.round(F.col("o_totalprice") * 100) * 2).cast("long")
        .alias("cents"),
    )
    snapshot_commit(spark, table_dir, base, mode="append")
    version, merged = snapshot_merge(spark, table_dir, upd, "k")
    # gate through the TABLE: actions from the merge frame, values from
    # a fresh read of the committed version
    actions = merged.select(F.col("k"), "merge_action")
    committed = snapshot_read(spark, table_dir, version=version)
    return (
        committed.join(actions, "k")
        .select(F.col("k").alias("o_orderkey"), "pri", "cents",
                "merge_action")
    )


@query(
    "snapshot_compact_parity",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY 1
    """,
)
def snapshot_compact_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE on the snapshot format in the hash gate
    (operators/snapshots.py:snapshot_compact): six small appends (one
    per pmod(event_id, 6) slice) produce a many-file table; compaction
    rewrites it to 2 files as a read-validated overwrite. The query
    raises unless the file count strictly shrank AND the pre-compaction
    version still serves its full row count via time travel (history
    preserved — compaction changes LAYOUT, never data); the hash then
    proves the compacted table is row-identical to the whole events
    table. The companion raw-directory verb is
    maintenance_compact_vacuum_roundtrip; this is the same verb under
    the commit protocol, where it becomes crash-safe and concurrent-
    writer-safe for free."""
    from ..operators.snapshots import (snapshot_commit, snapshot_compact,
                                       snapshot_read)

    table_dir = _scratch(sf_dir, "snapshot_compact")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.pmod(F.col("event_id"), F.lit(6)).alias("slot"),
    )
    for s in range(6):
        snapshot_commit(spark, table_dir,
                        ev.filter(F.col("slot") == s).drop("slot"),
                        mode="append")
    pre_rows = snapshot_read(spark, table_dir).count()
    version, before, after = snapshot_compact(spark, table_dir,
                                              target_files=2)
    if after >= before:
        raise RuntimeError(
            f"snapshot_compact_parity: compaction did not shrink the "
            f"file count ({before} -> {after})")
    if snapshot_read(spark, table_dir, version=version - 1).count() \
            != pre_rows:
        raise RuntimeError(
            "snapshot_compact_parity: the pre-compaction version lost "
            "rows — history must be preserved")
    return (
        snapshot_read(spark, table_dir, version=version)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("cents").alias("cents"))
    )


# ---------------------------------------------------------------------------
# Snapshot format round 10: predicate-scoped copy-on-write, row-level
# deletes + change data feed, timestamp time travel, clustered commits —
# the items VERDICT r9 named as the remaining gap to a production table
# format.
# ---------------------------------------------------------------------------
@query(
    "snapshot_partial_merge_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 1200 AND o_orderkey % 4 <> 1
    ),
    upd AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) * 2 AS BIGINT) AS cents
        FROM orders WHERE o_orderkey > 400 AND o_orderkey <= 800
    )
    SELECT COALESCE(u.k, b.k) AS o_orderkey,
           COALESCE(u.pri, b.pri) AS pri,
           COALESCE(u.cents, b.cents) AS cents,
           CASE WHEN u.k IS NOT NULL AND b.k IS NOT NULL THEN 'updated'
                WHEN u.k IS NOT NULL THEN 'inserted'
                ELSE 'kept' END AS merge_action
    FROM base b FULL OUTER JOIN upd u ON b.k = u.k
    """,
)
def snapshot_partial_merge_parity(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Predicate-scoped copy-on-write MERGE
    (operators/snapshots.py:snapshot_merge + _split_dirty): the base is
    committed as THREE key-band appends (k <= 400, (400, 800],
    (800, 1200], one file each; every fourth key withheld so the update
    batch also INSERTS); the update batch touches only the middle band.
    The merge must rewrite ONLY that band's file: the query raises
    unless the other two bands' manifest entries survive BYTE-IDENTICAL
    (same path, same stats — at 100 TB this is what makes a MERGE into
    one band O(band), not O(table)) and the dirty file is gone from the
    new manifest. The hash then proves the scoped rewrite equals the
    full-table merge semantics (the oracle joins base and updates over
    the WHOLE table), actions included — a row lost from a carried
    file, a stale dirty row, or a misclassified action flips it."""
    from ..operators.snapshots import (_read_manifest, snapshot_commit,
                                       snapshot_current_version,
                                       snapshot_merge, snapshot_read)

    table_dir = _scratch(sf_dir, "snapshot_partial_merge")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    base = orders.filter(
        (F.col("o_orderkey") <= 1200) & (F.col("o_orderkey") % 4 != 1)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bands = [
        F.col("k") <= 400,
        (F.col("k") > 400) & (F.col("k") <= 800),
        F.col("k") > 800,
    ]
    for band in bands:
        snapshot_commit(spark, table_dir,
                        base.filter(band).coalesce(1), mode="append")
    base_version = snapshot_current_version(table_dir)
    pre = {e["path"]: e
           for e in _read_manifest(table_dir, base_version)["files"]}

    upd = orders.filter(
        (F.col("o_orderkey") > 400) & (F.col("o_orderkey") <= 800)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        (F.round(F.col("o_totalprice") * 100) * 2).cast("long")
        .alias("cents"),
    )
    version, merged = snapshot_merge(spark, table_dir, upd, "k")
    post = {e["path"]: e
            for e in _read_manifest(table_dir, version)["files"]}
    carried = set(pre) & set(post)
    if len(carried) != 2 or any(post[p] != pre[p] for p in carried):
        raise RuntimeError(
            f"snapshot_partial_merge_parity: expected exactly the two "
            f"untouched band files carried forward identically, got "
            f"{len(carried)} of {len(pre)} — the merge rewrote more "
            "than the dirty band")
    if not (set(pre) - carried).isdisjoint(post):
        raise RuntimeError(
            "snapshot_partial_merge_parity: the dirty band's file "
            "survived the rewrite — stale rows would double-count")
    actions = merged.select(F.col("k"), "merge_action")
    committed = snapshot_read(spark, table_dir, version=version)
    return (
        committed.join(actions, "k")
        .select(F.col("k").alias("o_orderkey"), "pri", "cents",
                "merge_action")
    )


@query(
    "snapshot_cdf_read_parity",
    oracle="""
    WITH ord AS (
        SELECT o_orderkey AS k,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    final AS (
        SELECT k,
               CASE WHEN k > 300 AND k <= 450 THEN cents * 2
                    ELSE cents END AS cents
        FROM ord WHERE k > 150 AND k <= 1100
    )
    SELECT 'final' AS section, k AS o_orderkey, cents FROM final
    UNION ALL
    SELECT 'replay', k, cents FROM final
    UNION ALL
    SELECT 'deleted', k, cents FROM ord WHERE k <= 150
    """,
)
def snapshot_cdf_read_parity(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Row-level deletes + the change data feed
    (operators/snapshots.py:snapshot_apply_cdc / snapshot_read_cdf),
    closing VERDICT r9's 'one merge strands every incremental consumer':
    the table takes two appends (k <= 600, (600, 900]), then a CDC
    commit that DELETES k <= 150, doubles (300, 450] and inserts
    (900, 1000], then a COMPACTION, then another append ((1000, 1100]).
    ``snapshot_read_cdf(0)`` crosses all of it: appends as synthesized
    'I' rows, the CDC commit via its recorded change log (deletes carry
    their OLD values), the compaction as ZERO rows (the query raises if
    it contributes any). Three gated sections: ``final`` (the head
    table), ``replay`` (apply_cdc of the FEED over the version-0 read —
    the oracle forces it equal to final by computing the same state
    twice: a feed that lost a delete, replayed the compaction, or
    double-applied an update flips it), and ``deleted`` (the feed's 'D'
    rows vs the plain k <= 150 predicate)."""
    from ..operators.merge import apply_cdc
    from ..operators.snapshots import (snapshot_apply_cdc,
                                       snapshot_commit, snapshot_compact,
                                       snapshot_read, snapshot_read_cdf)

    table_dir = _scratch(sf_dir, "snapshot_cdf")
    ord_df = load_table(spark, sf_dir, "orders", rebalance=False).select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    snapshot_commit(spark, table_dir,
                    ord_df.filter(F.col("k") <= 600).coalesce(1),
                    mode="append")
    snapshot_commit(
        spark, table_dir,
        ord_df.filter((F.col("k") > 600) & (F.col("k") <= 900))
        .coalesce(1), mode="append")

    deletes = ord_df.filter(F.col("k") <= 150).select(
        "k", "cents", F.lit(1).alias("seq"), F.lit("D").alias("op"))
    updates = ord_df.filter(
        (F.col("k") > 300) & (F.col("k") <= 450)).select(
        "k", (F.col("cents") * 2).alias("cents"),
        F.lit(1).alias("seq"), F.lit("U").alias("op"))
    inserts = ord_df.filter(
        (F.col("k") > 900) & (F.col("k") <= 1000)).select(
        "k", "cents", F.lit(1).alias("seq"), F.lit("U").alias("op"))
    changes = deletes.unionByName(updates).unionByName(inserts)
    snapshot_apply_cdc(spark, table_dir, changes, "k")

    compact_version, _, _ = snapshot_compact(spark, table_dir,
                                             target_files=2)
    snapshot_commit(
        spark, table_dir,
        ord_df.filter((F.col("k") > 1000) & (F.col("k") <= 1100))
        .coalesce(1), mode="append")

    feed = snapshot_read_cdf(spark, table_dir, 0)
    if feed.filter(F.col("_commit_version")
                   == F.lit(compact_version)).count() != 0:
        raise RuntimeError(
            "snapshot_cdf_read_parity: the compaction contributed "
            "change rows — a layout-only commit must be silent in the "
            "feed")
    replay_changes = feed.select(
        "k", "cents",
        F.col("_commit_version").alias("seq"),
        F.when(F.col("_change_type") == "D", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"))
    replayed = apply_cdc(
        snapshot_read(spark, table_dir, version=0), replay_changes, "k")

    def shape(df: DataFrame, section: str) -> DataFrame:
        return df.select(F.lit(section).alias("section"),
                         F.col("k").alias("o_orderkey"), "cents")

    return (
        shape(snapshot_read(spark, table_dir), "final")
        .unionByName(shape(replayed, "replay"))
        .unionByName(shape(
            feed.filter(F.col("_change_type") == "D"), "deleted"))
    )


@query(
    "snapshot_as_of_read_parity",
    oracle=f"""
    WITH base AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
    ),
    v0 AS (SELECT * FROM base WHERE day < '{_SNAP_C1}'),
    v1 AS (SELECT * FROM base WHERE day < '{_SNAP_C2}'),
    v2 AS (SELECT * FROM v1 WHERE event_type <> 'error')
    SELECT CAST(0 AS BIGINT) AS asof_step, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(c) AS BIGINT) AS cents
    FROM v0 GROUP BY 2
    UNION ALL
    SELECT CAST(1 AS BIGINT), event_type,
           CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT)
    FROM v1 GROUP BY 2
    UNION ALL
    SELECT CAST(2 AS BIGINT), event_type,
           CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT)
    FROM v2 GROUP BY 2
    """,
)
def snapshot_as_of_read_parity(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Timestamp-based time travel (operators/snapshots.py:
    snapshot_version_at / snapshot_read(as_of=...)): the same three
    commits as the version-travel gate (two appends, one cleaning
    overwrite), but each historical state is read back by a WALL-CLOCK
    timestamp captured between commits — the AS OF TIMESTAMP form users
    actually write. The query raises unless each captured timestamp
    resolves to exactly the version committed before it (pinning the
    newest-committed_at-<= resolution rule, including the in-between
    case); the hash then proves each as-of read serves that version's
    exact rows. Boundary semantics (exact commit instant, before-first
    raises, version+as_of rejected) are pytest-pinned."""
    import time as _time

    from ..operators.snapshots import (snapshot_commit, snapshot_read,
                                       snapshot_version_at)

    table_dir = _scratch(sf_dir, "snapshot_asof")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    stamps = []
    snapshot_commit(spark, table_dir, ev.filter(F.col("day") < _SNAP_C1),
                    mode="append")
    stamps.append(_time.time())
    snapshot_commit(
        spark, table_dir,
        ev.filter((F.col("day") >= _SNAP_C1) & (F.col("day") < _SNAP_C2)),
        mode="append")
    stamps.append(_time.time())
    cleaned = snapshot_read(spark, table_dir).filter(
        F.col("event_type") != "error")
    snapshot_commit(spark, table_dir, cleaned, mode="overwrite")
    stamps.append(_time.time())

    views = []
    for step, ts in enumerate(stamps):
        resolved = snapshot_version_at(table_dir, ts)
        if resolved != step:
            raise RuntimeError(
                f"snapshot_as_of_read_parity: timestamp {step} resolved "
                f"to version {resolved}, expected {step}")
        views.append(
            snapshot_read(spark, table_dir, as_of=ts)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"), F.sum("c").alias("cents"))
            .select(F.lit(step).cast("long").alias("asof_step"),
                    "event_type", "n_events", "cents")
        )
    out = views[0]
    for extra in views[1:]:
        out = out.unionByName(extra)
    return out


def _z_events_terms(x: str, y: str) -> str:
    from .relational5 import _z16_terms
    return _z16_terms(x, y)


_ZC_X = "CAST(datediff(CAST(ts AS TIMESTAMP), TIMESTAMP'2024-01-01') AS BIGINT)"


@query(
    "snapshot_clustered_write_parity",
    oracle="""
    WITH b AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               ((CAST(ROUND(value * 100) AS BIGINT) % 64) + 64) % 64 AS y
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM b
    WHERE x BETWEEN 10 AND 14 AND y BETWEEN 0 AND 15
    GROUP BY 1
    """,
)
def snapshot_clustered_write_parity(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Clustered commits INTO the snapshot format (VERDICT r9 item 6 —
    operators/snapshots.py:snapshot_commit_clustered composing the
    zorder/layout recipe with the commit protocol): the same events
    projection is committed TWICE — once randomly partitioned (the
    naive twin), once range-clustered on a Morton key interleaving
    (day index, cent bucket) so each data file owns a compact z-block
    and its manifest min/max are tight in BOTH dimensions at once.
    A 2-D rectangle predicate (x in [10,14], y in [0,15]) must then
    stats-prune the clustered table STRICTLY below both its own total
    and the naive twin's planned count (the query raises otherwise —
    pruning demonstrably came from the layout, not the predicate), and
    the pruned scan must hash-equal the plain rectangle filter over
    whole events. The z key is layout-only: pruning reads the x/y
    column stats that z-locality tightens, so readers never need the
    key — exactly how OPTIMIZE ZORDER serves ordinary predicates."""
    from ..operators.snapshots import (snapshot_commit,
                                       snapshot_commit_clustered,
                                       snapshot_pruned_files,
                                       snapshot_scan)

    zx = f"({_ZC_X}) & 65535"
    zy = "CAST(pmod(CAST(ROUND(value * 100) AS BIGINT), 64) AS BIGINT)"
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.expr(_ZC_X).cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.expr(zy).alias("y"),
        F.expr(f"CAST({_z_events_terms(zx, zy)} AS BIGINT)").alias("z"),
    )
    naive_dir = _scratch(sf_dir, "snapshot_unclustered")
    clustered_dir = _scratch(sf_dir, "snapshot_clustered")
    snapshot_commit(spark, naive_dir, ev.repartition(8), mode="append")
    snapshot_commit_clustered(spark, clustered_dir, ev, ["z"], 8,
                              mode="append")

    preds = [("x", ">=", 10), ("x", "<=", 14),
             ("y", ">=", 0), ("y", "<=", 15)]
    kept_z, total_z = snapshot_pruned_files(clustered_dir, preds)
    kept_n, total_n = snapshot_pruned_files(naive_dir, preds)
    if not kept_z or len(kept_z) >= total_z or len(kept_z) >= len(kept_n):
        raise RuntimeError(
            f"snapshot_clustered_write_parity: expected the z-clustered "
            f"layout to prune strictly harder than the naive one, got "
            f"{len(kept_z)}/{total_z} clustered vs {len(kept_n)}/"
            f"{total_n} naive")
    return (
        snapshot_scan(spark, clustered_dir, preds)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("cents").alias("cents"))
    )


@query(
    "snapshot_merge_delete_unmatched_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 1200 AND o_orderkey % 5 <> 1
    ),
    src AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) * 2 AS BIGINT) AS cents
        FROM orders
        WHERE o_orderkey > 400 AND o_orderkey <= 800
          AND o_orderkey % 3 = 0
    )
    SELECT COALESCE(s.k, b.k) AS o_orderkey,
           COALESCE(s.pri, b.pri) AS pri,
           COALESCE(s.cents, b.cents) AS cents,
           CASE WHEN s.k IS NOT NULL AND b.k IS NOT NULL THEN 'updated'
                WHEN s.k IS NOT NULL THEN 'inserted'
                ELSE 'kept' END AS merge_action
    FROM base b FULL OUTER JOIN src s ON b.k = s.k
    WHERE s.k IS NOT NULL OR b.k <= 400 OR b.k > 800
    """,
)
def snapshot_merge_delete_unmatched_parity(spark: SparkSession,
                                           sf_dir: str) -> DataFrame:
    """MERGE with WHEN NOT MATCHED BY SOURCE THEN DELETE
    (operators/snapshots.py:snapshot_merge(not_matched_by_source=
    'delete', source_scope=...)): the base is three key-band files
    (k <= 400, (400, 800], > 800; every fifth key withheld so the
    source also INSERTS); the source holds only every third key of the
    middle band, doubled. Scoped to (400, 800], the merge must UPDATE
    the source-matched middle-band rows, INSERT the source-only keys,
    DELETE every other middle-band row (unmatched by source, in
    scope), and leave both outer bands carried forward BYTE-IDENTICAL
    (the query raises otherwise — the clause must not widen the
    copy-on-write past its scope band). The change feed's D rows must
    equal the audited deletes exactly (raises otherwise — deletes ride
    the CDF with their pre-delete values). The hash then gates the
    final state + actions against the full-semantics oracle (deleted
    rows absent; out-of-scope rows 'kept')."""
    from ..operators.snapshots import (_read_manifest, snapshot_commit,
                                       snapshot_current_version,
                                       snapshot_merge, snapshot_read,
                                       snapshot_read_cdf)

    table_dir = _scratch(sf_dir, "snapshot_merge_delete")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    base = orders.filter(
        (F.col("o_orderkey") <= 1200) & (F.col("o_orderkey") % 5 != 1)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bands = [
        F.col("k") <= 400,
        (F.col("k") > 400) & (F.col("k") <= 800),
        F.col("k") > 800,
    ]
    for band in bands:
        snapshot_commit(spark, table_dir,
                        base.filter(band).coalesce(1), mode="append")
    base_version = snapshot_current_version(table_dir)
    pre = {e["path"]: e
           for e in _read_manifest(table_dir, base_version)["files"]}

    src = orders.filter(
        (F.col("o_orderkey") > 400) & (F.col("o_orderkey") <= 800)
        & (F.col("o_orderkey") % 3 == 0)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        (F.round(F.col("o_totalprice") * 100) * 2).cast("long")
        .alias("cents"),
    )
    version, merged = snapshot_merge(
        spark, table_dir, src, "k",
        not_matched_by_source="delete", source_scope=(401, 800))
    post = {e["path"]: e
            for e in _read_manifest(table_dir, version)["files"]}
    carried = set(pre) & set(post)
    if len(carried) != 2 or any(post[p] != pre[p] for p in carried):
        raise RuntimeError(
            "snapshot_merge_delete_unmatched_parity: expected both "
            "out-of-scope band files carried forward identically, got "
            f"{len(carried)} of {len(pre)} — the delete clause widened "
            "the copy-on-write past its scope band")
    deleted_keys = {
        r["k"] for r in merged.filter(
            F.col("merge_action") == "deleted").select("k").collect()}
    if not deleted_keys:
        raise RuntimeError(
            "snapshot_merge_delete_unmatched_parity: the clause deleted "
            "nothing — the fixture guarantees unmatched in-scope rows")
    cdf_deleted = {
        r["k"] for r in snapshot_read_cdf(
            spark, table_dir, from_version=version - 1,
            to_version=version)
        .filter(F.col("_change_type") == "D").select("k").collect()}
    if cdf_deleted != deleted_keys:
        raise RuntimeError(
            "snapshot_merge_delete_unmatched_parity: the change feed's "
            f"D rows ({len(cdf_deleted)}) differ from the audited "
            f"deletes ({len(deleted_keys)}) — deletes must ride the CDF")
    actions = merged.filter(F.col("merge_action") != "deleted") \
        .select(F.col("k"), "merge_action")
    committed = snapshot_read(spark, table_dir, version=version)
    return (
        committed.join(actions, "k")
        .select(F.col("k").alias("o_orderkey"), "pri", "cents",
                "merge_action")
    )


@query(
    "snapshot_history_parity",
    oracle="""
    WITH c AS (SELECT
      (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 500) AS c0,
      (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 1000) AS c1,
      (SELECT COUNT(*) FROM orders) AS c2)
    SELECT CAST(0 AS BIGINT) AS version, 'append' AS mode,
           CAST(c0 AS BIGINT) AS n_rows, FALSE AS has_log FROM c
    UNION ALL SELECT 1, 'append', CAST(c1 AS BIGINT), FALSE FROM c
    UNION ALL SELECT 2, 'append', CAST(c2 AS BIGINT), FALSE FROM c
    UNION ALL SELECT 3, 'rewrite', CAST(c2 AS BIGINT), TRUE FROM c
    UNION ALL SELECT 4, 'rewrite', CAST(c2 AS BIGINT), TRUE FROM c
    """,
)
def snapshot_history_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY over the snapshot table
    (operators/snapshots.py:snapshot_history): three appends, one
    predicate-scoped MERGE, one compaction — history must report one
    row per version with the right mode, the FOOTER-harvested
    cumulative row count (no data file is opened: counts come from the
    manifests), and a change log exactly on the rewrite commits. The
    query raises unless the parent chain is contiguous, commit
    timestamps are non-decreasing, and every version has files; the
    hash then gates (version, mode, n_rows, has_log) against counts
    the oracle computes directly from the orders table."""
    from ..operators.snapshots import (snapshot_commit, snapshot_compact,
                                       snapshot_history, snapshot_merge)

    table_dir = _scratch(sf_dir, "snapshot_history")
    orders = load_table(spark, sf_dir, "orders", rebalance=False).select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    for cond in (F.col("k") <= 500,
                 (F.col("k") > 500) & (F.col("k") <= 1000),
                 F.col("k") > 1000):
        snapshot_commit(spark, table_dir, orders.filter(cond).coalesce(1),
                        mode="append")
    upd = orders.filter((F.col("k") > 200) & (F.col("k") <= 400)) \
        .withColumn("cents", F.col("cents") * 2)
    snapshot_merge(spark, table_dir, upd, "k")
    snapshot_compact(spark, table_dir, target_files=2)

    hist = snapshot_history(spark, table_dir)
    rows = hist.orderBy("version").collect()
    if [r.version for r in rows] != [0, 1, 2, 3, 4]:
        raise RuntimeError(
            "snapshot_history_parity: expected versions 0..4, got "
            f"{[r.version for r in rows]}")
    for prev, cur in zip(rows, rows[1:]):
        if cur.parent != prev.version:
            raise RuntimeError(
                f"snapshot_history_parity: version {cur.version} has "
                f"parent {cur.parent}, expected {prev.version} — the "
                "chain must be contiguous")
        if cur.committed_at < prev.committed_at:
            raise RuntimeError(
                "snapshot_history_parity: commit timestamps regressed")
    if any(r.n_files < 1 for r in rows) or any(
            r.from_stream_epoch for r in rows):
        raise RuntimeError(
            "snapshot_history_parity: every batch version must have "
            "files and no stream epoch")
    return hist.select(
        "version", "mode", "n_rows",
        F.col("n_change_files").isNotNull().alias("has_log"))


@query(
    "snapshot_restore_parity",
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders WHERE o_orderkey <= 800
    """,
)
def snapshot_restore_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE TO VERSION
    (operators/snapshots.py:snapshot_restore): after an append and a
    MERGE mutate the table, restoring to version 0 must commit a NEW
    version whose manifest references EXACTLY version 0's files (the
    query raises otherwise — restore is O(1) data movement, no file is
    copied), leave the pre-restore head time-travelable, and record
    the row-level change log of the restore (D rows for the appended
    keys it removes, U rows for the merged cents it reverts, zero I
    rows) so CDF consumers ride through it — each class is asserted.
    The hash then gates the restored state against the oracle's
    version-0 reconstruction."""
    from ..operators.snapshots import (_read_manifest, snapshot_commit,
                                       snapshot_merge, snapshot_read,
                                       snapshot_read_cdf, snapshot_restore)

    table_dir = _scratch(sf_dir, "snapshot_restore")
    orders = load_table(spark, sf_dir, "orders", rebalance=False).select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    snapshot_commit(spark, table_dir,
                    orders.filter(F.col("k") <= 800).coalesce(1),
                    mode="append")                                  # v0
    snapshot_commit(spark, table_dir,
                    orders.filter(F.col("k") > 800).coalesce(1),
                    mode="append")                                  # v1
    upd = orders.filter((F.col("k") > 200) & (F.col("k") <= 400)) \
        .withColumn("cents", F.col("cents") * 2)
    snapshot_merge(spark, table_dir, upd, "k")                      # v2
    pre_head_rows = snapshot_read(spark, table_dir, version=2).count()
    v = snapshot_restore(spark, table_dir, 0, key="k")              # v3
    v0_paths = [e["path"] for e in _read_manifest(table_dir, 0)["files"]]
    v3_paths = [e["path"] for e in _read_manifest(table_dir, v)["files"]]
    if sorted(v3_paths) != sorted(v0_paths):
        raise RuntimeError(
            "snapshot_restore_parity: the restore manifest must "
            "reference exactly version 0's files — restore is O(1) "
            "data movement")
    if snapshot_read(spark, table_dir, version=2).count() != pre_head_rows:
        raise RuntimeError(
            "snapshot_restore_parity: the pre-restore head lost rows — "
            "restore must preserve history")
    feed = snapshot_read_cdf(spark, table_dir, from_version=2,
                             to_version=v)
    by_type = {r["_change_type"]: r["n"] for r in
               feed.groupBy("_change_type").agg(F.count("*").alias("n"))
               .collect()}
    n_appended = orders.filter(F.col("k") > 800).count()
    n_merged = upd.count()
    if (by_type.get("D", 0) != n_appended
            or by_type.get("U", 0) != n_merged
            or by_type.get("I", 0) != 0):
        raise RuntimeError(
            f"snapshot_restore_parity: restore change log {by_type} != "
            f"expected D={n_appended} U={n_merged} I=0 — the feed must "
            "express the restore exactly")
    return snapshot_read(spark, table_dir, version=v).select(
        F.col("k").alias("o_orderkey"), "cents")


@query(
    "snapshot_merge_update_unmatched_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 1200 AND o_orderkey % 5 <> 1
    ),
    src AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) * 2 AS BIGINT) AS cents
        FROM orders
        WHERE o_orderkey > 400 AND o_orderkey <= 800
          AND o_orderkey % 3 = 0
    )
    SELECT COALESCE(s.k, b.k) AS o_orderkey,
           CASE WHEN s.k IS NOT NULL THEN s.pri
                WHEN b.k > 400 AND b.k <= 800 THEN 'STALE'
                ELSE b.pri END AS pri,
           COALESCE(s.cents, b.cents) AS cents,
           CASE WHEN s.k IS NOT NULL AND b.k IS NOT NULL THEN 'updated'
                WHEN s.k IS NOT NULL THEN 'inserted'
                WHEN b.k > 400 AND b.k <= 800 THEN 'updated_unmatched'
                ELSE 'kept' END AS merge_action
    FROM base b FULL OUTER JOIN src s ON b.k = s.k
    """,
)
def snapshot_merge_update_unmatched_parity(spark: SparkSession,
                                           sf_dir: str) -> DataFrame:
    """MERGE with WHEN NOT MATCHED BY SOURCE THEN UPDATE SET
    (operators/snapshots.py:snapshot_merge(not_matched_by_source=
    {col: Column})): same three-band fixture as the delete-clause
    gate, but in-scope unmatched rows are MARKED (pri → 'STALE')
    instead of deleted — the soft-delete / staleness-flag form of the
    clause. The merge must UPDATE matched middle-band rows from the
    source, INSERT source-only keys, re-label every other middle-band
    row 'STALE', keep both outer band files carried forward
    byte-identical (raises otherwise), and log the staleness flips as
    U rows in the change feed (count asserted: every in-band base row
    changes — matched cents double, unmatched pri flips). The hash
    gates rows + actions against the full-semantics oracle."""
    from ..operators.snapshots import (_read_manifest, snapshot_commit,
                                       snapshot_current_version,
                                       snapshot_merge, snapshot_read,
                                       snapshot_read_cdf)

    table_dir = _scratch(sf_dir, "snapshot_merge_update_unmatched")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    base = orders.filter(
        (F.col("o_orderkey") <= 1200) & (F.col("o_orderkey") % 5 != 1)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    for band in (F.col("k") <= 400,
                 (F.col("k") > 400) & (F.col("k") <= 800),
                 F.col("k") > 800):
        snapshot_commit(spark, table_dir,
                        base.filter(band).coalesce(1), mode="append")
    base_version = snapshot_current_version(table_dir)
    pre = {e["path"]: e
           for e in _read_manifest(table_dir, base_version)["files"]}

    src = orders.filter(
        (F.col("o_orderkey") > 400) & (F.col("o_orderkey") <= 800)
        & (F.col("o_orderkey") % 3 == 0)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        (F.round(F.col("o_totalprice") * 100) * 2).cast("long")
        .alias("cents"),
    )
    version, merged = snapshot_merge(
        spark, table_dir, src, "k",
        not_matched_by_source={"pri": F.lit("STALE")},
        source_scope=(401, 800))
    post = {e["path"]: e
            for e in _read_manifest(table_dir, version)["files"]}
    carried = set(pre) & set(post)
    if len(carried) != 2 or any(post[p] != pre[p] for p in carried):
        raise RuntimeError(
            "snapshot_merge_update_unmatched_parity: expected both "
            "out-of-scope band files carried forward identically — the "
            "update clause widened the copy-on-write past its scope")
    n_u = snapshot_read_cdf(spark, table_dir, from_version=version - 1,
                            to_version=version) \
        .filter(F.col("_change_type") == "U").count()
    n_in_band = base.filter(
        (F.col("k") > 400) & (F.col("k") <= 800)).count()
    if n_u != n_in_band:
        raise RuntimeError(
            f"snapshot_merge_update_unmatched_parity: the feed logs "
            f"{n_u} U rows, expected {n_in_band} (every in-band base "
            "row changes: matched cents double, unmatched pri flips)")
    actions = merged.select(F.col("k"), "merge_action")
    committed = snapshot_read(spark, table_dir, version=version)
    return (
        committed.join(actions, "k")
        .select(F.col("k").alias("o_orderkey"), "pri", "cents",
                "merge_action")
    )


# ---------------------------------------------------------------------------
# r11: OVERWRITE WHERE (replaceWhere) — the predicate-scoped overwrite.
# ---------------------------------------------------------------------------
@query(
    "snapshot_replace_where_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 1200
    ),
    repl AS (
        SELECT k, pri, cents * 2 AS cents FROM base
        WHERE k > 400 AND k <= 800 AND k % 3 = 0
    ),
    final AS (
        SELECT * FROM base WHERE NOT (k > 400 AND k <= 800)
        UNION ALL SELECT * FROM repl
    )
    SELECT 'final' AS section, k AS o_orderkey, pri, cents FROM final
    UNION ALL
    SELECT 'replayed' AS section, k, pri, cents FROM final
    """,
)
def snapshot_replace_where_parity(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """OVERWRITE WHERE as a snapshot verb
    (operators/snapshots.py:snapshot_overwrite_where — VERDICT r10
    item 2): the base is committed as THREE key-band appends (one file
    each); a predicate-scoped overwrite replaces the middle band
    (k in (400, 800]) with a THINNER recomputed batch (every third key,
    cents doubled — a backfill that also deletes). The verb must
    rewrite ONLY the dirty band's file — the query raises unless both
    outer bands' manifest entries survive BYTE-IDENTICAL (the O(band)
    property a partition backfill needs at 100 TB) — and, because the
    commit records its row-level change log, the CDF stream RIDES
    THROUGH the backfill: the gate replays the feed (I/U→upsert, D→
    delete) over the pre-overwrite state and hash-checks the replica
    against the head, both against the oracle's delete-then-insert
    twice. A plain overwrite here would strand the feed (documented
    barrier); this is the verb that keeps consumers incremental."""
    from ..operators.merge import apply_cdc
    from ..operators.snapshots import (_read_manifest, snapshot_commit,
                                       snapshot_current_version,
                                       snapshot_overwrite_where,
                                       snapshot_read, snapshot_read_cdf)

    table_dir = _scratch(sf_dir, "snapshot_replace_where")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    base = orders.filter(F.col("o_orderkey") <= 1200).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bands = [
        F.col("k") <= 400,
        (F.col("k") > 400) & (F.col("k") <= 800),
        F.col("k") > 800,
    ]
    for band in bands:
        snapshot_commit(spark, table_dir,
                        base.filter(band).coalesce(1), mode="append")
    base_version = snapshot_current_version(table_dir)
    pre = {e["path"]: e
           for e in _read_manifest(table_dir, base_version)["files"]}

    repl = base.filter(
        (F.col("k") > 400) & (F.col("k") <= 800)
        & (F.col("k") % 3 == 0)
    ).withColumn("cents", F.col("cents") * 2)
    version, stats = snapshot_overwrite_where(
        spark, table_dir,
        [("k", ">", 400), ("k", "<=", 800)], repl, key="k")
    post = {e["path"]: e
            for e in _read_manifest(table_dir, version)["files"]}
    carried = set(pre) & set(post)
    if len(carried) != 2 or any(post[p] != pre[p] for p in carried):
        raise RuntimeError(
            f"snapshot_replace_where_parity: expected both out-of-band "
            f"files carried forward identically, got {len(carried)} of "
            f"{len(pre)} — replaceWhere rewrote more than its scope")
    if not (set(pre) - carried).isdisjoint(post):
        raise RuntimeError(
            "snapshot_replace_where_parity: the replaced band's file "
            "survived — stale rows would double-count")

    # the CDF rides through: replay the backfill's feed over the
    # pre-overwrite state and it must reproduce the head exactly
    feed = snapshot_read_cdf(spark, table_dir, base_version, version)
    changes = feed.select(
        "k", "pri", "cents",
        F.col("_commit_version").alias("seq"),
        F.when(F.col("_change_type").isin("I", "U"), F.lit("U"))
        .otherwise(F.lit("D")).alias("op"),
    )
    before = snapshot_read(spark, table_dir, version=base_version)
    replayed = apply_cdc(before, changes, "k").drop("cdc_action")
    final = snapshot_read(spark, table_dir, version=version)
    return (
        final.select(F.lit("final").alias("section"),
                     F.col("k").alias("o_orderkey"), "pri", "cents")
        .unionByName(replayed.select(
            F.lit("replayed").alias("section"),
            F.col("k").alias("o_orderkey"), "pri", "cents"))
    )


# ---------------------------------------------------------------------------
# r11: composite merge keys — MERGE ON (k1, k2) with the band-box split.
# ---------------------------------------------------------------------------
@query(
    "snapshot_merge_composite_key_parity",
    oracle="""
    WITH keyed AS (
        SELECT (o_orderkey - 1) // 400 AS bucket, o_orderkey % 400 AS seq,
               o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 1200
    ),
    base AS (SELECT * FROM keyed WHERE seq % 4 <> 1),
    upd AS (
        SELECT bucket, seq, pri, cents * 2 AS cents
        FROM keyed WHERE bucket = 1
    ),
    merged AS (
        SELECT COALESCE(u.bucket, b.bucket) AS bucket,
               COALESCE(u.seq, b.seq) AS seq,
               COALESCE(u.pri, b.pri) AS pri,
               COALESCE(u.cents, b.cents) AS cents
        FROM base b FULL OUTER JOIN upd u
          ON b.bucket = u.bucket AND b.seq = u.seq
    )
    SELECT 'final' AS section, bucket, seq, pri, cents FROM merged
    UNION ALL
    SELECT 'replayed' AS section, bucket, seq, pri, cents FROM merged
    """,
)
def snapshot_merge_composite_key_parity(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """MERGE on a COMPOSITE key (VERDICT r10 item 4 — the reference's
    own J3 key is (date, resourceId): a coarse partition column plus a
    fine id; here (bucket, seq) = (div, mod) of the order key, unique
    by construction — the fixture's lineitem (orderkey, linenumber) is
    NOT unique, checked). The base withholds every fourth seq, the
    update batch carries bucket 1 complete, so the two-column merge
    both updates (cents doubled) and inserts (the withheld keys). The
    dirty split uses the per-column band BOX — the update batch's
    bucket band is exactly [1, 1] while its seq band spans everything,
    so the two outer bucket files must survive byte-identical (raises
    otherwise: a convex-hull or single-key split would dirty all
    three). The commit records the composite-key change log; the gate
    replays the feed with the composite-key apply_cdc over the
    pre-merge state and hash-checks replica == head == the oracle's
    two-key FULL OUTER JOIN."""
    from ..operators.merge import apply_cdc
    from ..operators.snapshots import (_read_manifest, snapshot_commit,
                                       snapshot_current_version,
                                       snapshot_merge, snapshot_read,
                                       snapshot_read_cdf)

    table_dir = _scratch(sf_dir, "snapshot_merge_composite")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    keyed = orders.filter(F.col("o_orderkey") <= 1200).select(
        F.expr("(o_orderkey - 1) div 400").alias("bucket"),
        (F.col("o_orderkey") % 400).alias("seq"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = keyed.filter(F.col("seq") % 4 != 1)
    for b in range(3):
        snapshot_commit(spark, table_dir,
                        base.filter(F.col("bucket") == b).coalesce(1),
                        mode="append")
    base_version = snapshot_current_version(table_dir)
    pre = {e["path"]: e
           for e in _read_manifest(table_dir, base_version)["files"]}

    upd = keyed.filter(F.col("bucket") == 1)         .withColumn("cents", F.col("cents") * 2)
    version, merged = snapshot_merge(spark, table_dir, upd,
                                     ["bucket", "seq"])
    post = {e["path"]: e
            for e in _read_manifest(table_dir, version)["files"]}
    carried = set(pre) & set(post)
    if len(carried) != 2 or any(post[p] != pre[p] for p in carried):
        raise RuntimeError(
            f"snapshot_merge_composite_key_parity: expected the two "
            f"outer-bucket files carried forward identically, got "
            f"{len(carried)} of {len(pre)} — the composite band box "
            "dirtied more than the touched bucket")
    acts = {r["merge_action"]: r["count"]
            for r in merged.groupBy("merge_action").count().collect()}
    if not (acts.get("updated", 0) > 0 and acts.get("inserted", 0) > 0
            and acts.get("kept", 0) > 0):
        raise RuntimeError(
            f"snapshot_merge_composite_key_parity: expected all three "
            f"merge actions to occur, got {acts} — the composite join "
            "or the fixture bands are broken")

    feed = snapshot_read_cdf(spark, table_dir, base_version, version)
    changes = feed.select(
        "bucket", "seq", "pri", "cents",
        F.col("_commit_version").alias("seq_no"),
        F.when(F.col("_change_type").isin("I", "U"), F.lit("U"))
        .otherwise(F.lit("D")).alias("op"),
    )
    before = snapshot_read(spark, table_dir, version=base_version)
    replayed = apply_cdc(before, changes, ["bucket", "seq"],
                         seq="seq_no").drop("cdc_action")
    final = snapshot_read(spark, table_dir, version=version)
    return (
        final.select(F.lit("final").alias("section"),
                     "bucket", "seq", "pri", "cents")
        .unionByName(replayed.select(
            F.lit("replayed").alias("section"),
            "bucket", "seq", "pri", "cents"))
    )


# ---------------------------------------------------------------------------
# r11: clustering-preserving compaction — OPTIMIZE keeps the layout.
# ---------------------------------------------------------------------------
_CCOMPACT_CUT = "2024-01-22"


@query(
    "snapshot_clustered_compact_parity",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') >= '{_CCOMPACT_CUT}'
    GROUP BY 1
    """,
)
def snapshot_clustered_compact_parity(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Clustering-preserving OPTIMIZE (VERDICT r10 item 3 — the one
    design wart it flagged): a day-clustered table is FRAGMENTED by
    four small unclustered appends (each spanning every day, so their
    footer day stats are table-wide), then compacted. Because
    ``snapshot_commit_clustered`` recorded the clustering lineage in
    the manifest, ``snapshot_compact`` re-clusters with
    ``repartitionByRange + sortWithinPartitions`` instead of the old
    round-robin ``repartition`` that destroyed the layout. The query
    raises unless (a) the post-compact manifest still records the
    lineage, (b) a day-band scan prunes STRICTLY (planned files <
    total — the round-robin layout would plan ALL files: every file's
    day span would be table-wide) and (c) plans at most as many files
    as the SAME band needed on the pre-fragmentation clustered layout.
    The hash then checks the band read against the plain events
    oracle — compaction moved rows between files, never changed one."""
    from ..operators.snapshots import (_read_manifest,
                                       snapshot_commit,
                                       snapshot_commit_clustered,
                                       snapshot_compact,
                                       snapshot_current_version,
                                       snapshot_pruned_files,
                                       snapshot_scan)

    table_dir = _scratch(sf_dir, "snapshot_clustered_compact")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    snapshot_commit_clustered(
        spark, table_dir, ev.filter(F.col("event_id") % 5 != 0),
        ["day"], 4)
    preds = [("day", ">=", _CCOMPACT_CUT)]
    kept0, total0 = snapshot_pruned_files(table_dir, preds, version=0)
    if not kept0 or len(kept0) >= total0:
        raise RuntimeError(
            "snapshot_clustered_compact_parity: the clustered base "
            f"layout does not prune ({len(kept0)}/{total0}) — fixture "
            "or clustering broken")
    # four fragment appends, each spanning the whole day range
    frag = ev.filter(F.col("event_id") % 5 == 0)
    for r in range(4):
        snapshot_commit(
            spark, table_dir,
            frag.filter(F.expr("(event_id div 5) % 4") == r)
            .coalesce(1),
            mode="append")
    version, before, after = snapshot_compact(spark, table_dir,
                                              target_files=4)
    if after >= before:
        raise RuntimeError(
            f"snapshot_clustered_compact_parity: compaction did not "
            f"shrink the file count ({before} -> {after})")
    m = _read_manifest(table_dir, snapshot_current_version(table_dir))
    if m.get("cluster_cols") != ["day"]:
        raise RuntimeError(
            f"snapshot_clustered_compact_parity: the clustering "
            f"lineage was lost across OPTIMIZE "
            f"(cluster_cols={m.get('cluster_cols')!r})")
    kept1, total1 = snapshot_pruned_files(table_dir, preds)
    if not kept1 or len(kept1) >= total1 or len(kept1) > len(kept0):
        raise RuntimeError(
            f"snapshot_clustered_compact_parity: post-compact pruning "
            f"regressed — {len(kept1)}/{total1} planned vs "
            f"{len(kept0)}/{total0} on the pre-fragmentation layout; "
            "OPTIMIZE de-clustered the table (the r10 wart)")
    return (
        snapshot_scan(spark, table_dir, preds)
        .groupBy("day")
        .agg(F.count("*").alias("n_events"),
             F.sum("cents").alias("cents"))
    )


# ---------------------------------------------------------------------------
# r11: IS NULL / IN / OR pruning — the harvested null counts finally read.
# ---------------------------------------------------------------------------
_NIP_C1, _NIP_C2 = "2024-01-08", "2024-01-15"


@query(
    "snapshot_null_in_pruned_read",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CASE WHEN strftime(ts, '%Y-%m-%d') >= '{_NIP_C1}'
                     AND strftime(ts, '%Y-%m-%d') < '{_NIP_C2}'
                    THEN NULL ELSE event_id END AS ref,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT 'is_null' AS section, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM ev WHERE ref IS NULL GROUP BY 2
    UNION ALL
    SELECT 'in_list', event_type,
           CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
    FROM ev WHERE day IN ('2024-01-02', '2024-01-05') GROUP BY 2
    UNION ALL
    SELECT 'disjunct', event_type,
           CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
    FROM ev WHERE day < '2024-01-03' OR day >= '2024-01-25' GROUP BY 2
    UNION ALL
    SELECT 'not_null', event_type,
           CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
    FROM ev WHERE ref IS NOT NULL GROUP BY 2
    """,
)
def snapshot_null_in_pruned_read(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The r11 predicate forms of ``snapshot_scan`` (VERDICT r10
    item 5 — the per-file null counts were harvested since r9 and
    never read): three day-band appends where the MIDDLE band's
    ``ref`` column is entirely NULL and the outer bands' is never
    NULL. Three gated legs, each pinning its planned-file count:

    - ``is_null``: ``ref IS NULL`` must plan ONLY the middle band's
      files — the outer files prune on their recorded ``nulls == 0``;
    - ``in_list``: ``day IN (d1, d2)`` with both members in the first
      band must plan only that band (each member probed like ``=``);
    - ``disjunct``: ``day < a OR day >= b`` (a CNF OR-term) must plan
      the two outer bands and drop the middle one;
    - ``not_null``: ``ref IS NOT NULL`` must drop the middle band —
      its files are provably ALL-NULL (complete null count == footer
      row count, the one probe that needs the entry's row count,
      since an all-null column carries no min/max stats at all).

    Every leg's rows then hash against the plain-predicate oracle —
    pruning that dropped a matching file would flip the counts.
    Scale note: each band commits with the plan's natural parallel
    partitioning (no coalesce — a 1-task write would serialize the
    ×100 fixture's 2M-row bands), so the planned-file pins are derived
    from each band commit's OWN manifest file count, not constants."""
    from ..operators.snapshots import (_read_manifest, snapshot_commit,
                                       snapshot_pruned_files,
                                       snapshot_scan)

    table_dir = _scratch(sf_dir, "snapshot_null_in_pruned")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.when(
            (F.date_format("ts", "yyyy-MM-dd") >= _NIP_C1)
            & (F.date_format("ts", "yyyy-MM-dd") < _NIP_C2),
            F.lit(None).cast("long"),
        ).otherwise(F.col("event_id")).alias("ref"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    bands = [
        F.col("day") < _NIP_C1,
        (F.col("day") >= _NIP_C1) & (F.col("day") < _NIP_C2),
        F.col("day") >= _NIP_C2,
    ]
    band_files = []  # per-band manifest file counts
    seen = 0
    for i, band in enumerate(bands):
        v = snapshot_commit(spark, table_dir, ev.filter(band),
                            mode="append")
        n = len(_read_manifest(table_dir, v)["files"])
        band_files.append(n - seen)
        seen = n

    legs = {
        "is_null": ([("ref", "is_null", None)], band_files[1]),
        "in_list": ([("day", "in", ["2024-01-02", "2024-01-05"])],
                    band_files[0]),
        "disjunct": ([[("day", "<", "2024-01-03"),
                       ("day", ">=", "2024-01-25")]],
                     band_files[0] + band_files[2]),
        "not_null": ([("ref", "is_not_null", None)],
                     band_files[0] + band_files[2]),
    }
    frames = []
    for section, (preds, expect_kept) in legs.items():
        kept, total = snapshot_pruned_files(table_dir, preds)
        if len(kept) != expect_kept or total != seen \
                or expect_kept >= total:
            raise RuntimeError(
                f"snapshot_null_in_pruned_read[{section}]: expected "
                f"{expect_kept}/{seen} files planned, got {len(kept)}/"
                f"{total} — the {section} pruning form is broken")
        frames.append(
            snapshot_scan(spark, table_dir, preds)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("cents").alias("cents"))
            .select(F.lit(section).alias("section"), "event_type",
                    "n_events", "cents"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# r11: the snapshot table behind SQL — batch Python DataSource + USING view.
# ---------------------------------------------------------------------------
@query(
    "snapshot_sql_surface_parity",
    oracle="""
    WITH ev AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    head AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM ev GROUP BY 1
    ),
    v0 AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM ev WHERE day < '2024-01-15' GROUP BY 1
    )
    SELECT 'sql_head' AS section, * FROM head
    UNION ALL SELECT 'api_head', * FROM head
    UNION ALL SELECT 'sql_v0', * FROM v0
    UNION ALL
    SELECT 'sql_pruned', event_type, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM ev WHERE day >= '2024-01-15' GROUP BY 2
    UNION ALL SELECT 'sql_notnull', * FROM head
    """,
)
def snapshot_sql_surface_parity(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The snapshot table through PURE SQL (VERDICT r10 item 6 — the
    engine's dual DataFrame+SQL charter stopped at the format
    boundary): the table registers as a BATCH Python DataSource
    (sources/snapshot_source.py:SnapshotTableBatchReader — the same
    executor-side aligned Arrow file reads as the stream), so
    ``CREATE TEMPORARY VIEW t USING snapshot_table OPTIONS (path,
    version)`` makes ``spark.sql`` read any committed version with no
    Python API in sight. Three gated sections: the head version via
    SQL, the head via ``snapshot_read`` (both must agree — the oracle
    states them as the same select twice), TIME TRAVEL via the view's
    ``version '0'`` option (the first band alone), and FILTER PUSHDOWN:
    with ``OPTIONS (pushdown 'true')`` the reader implements
    ``pushFilters`` (Spark 4.1 Python DataSource pushdown), so the
    ``sql_pruned`` section's WHERE clause prunes on the manifest stats
    — the query raises unless the reader, probed directly with the
    same predicate, plans strictly fewer files than the table holds —
    while every filter is handed back to Spark for exact row-level
    evaluation (the hash checks that). Pushdown is OPT-IN and the
    pruned view carries exactly ONE filter shape: Spark 4.1 caches the
    planned scan on the relation, so a pushdown relation reused across
    filter shapes would re-serve the first shape's file set (measured;
    the default pushdown-free reader is immune — the plain head view
    here is queried both filtered and unfiltered and stays exact)."""
    from ..operators.snapshots import snapshot_commit, snapshot_read
    from ..sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    table_dir = _scratch(sf_dir, "snapshot_sql_surface")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cut = "2024-01-15"
    snapshot_commit(spark, table_dir, ev.filter(F.col("day") < cut),
                    mode="append")
    snapshot_commit(spark, table_dir, ev.filter(F.col("day") >= cut),
                    mode="append")
    # a provably-ALL-NULL band (constant event_type, cents NULL, day
    # before the cut) so the r12 pushdown legs have something only the
    # null-count / constant-column probes can prune: IS NOT NULL must
    # drop this file, != on the constant must drop this file, <=> NULL
    # must KEEP ONLY this file. Head-version sections filter it out by
    # name (and the oracle never sees it).
    null_band = (spark.range(64)
                 .select(F.lit("__null_band__").alias("event_type"),
                         F.lit("2000-01-01").alias("day"),
                         F.lit(None).cast("long").alias("cents")))
    snapshot_commit(spark, table_dir, null_band.coalesce(1),
                    mode="append")

    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW snap_sql_head "
        f"USING snapshot_table OPTIONS (path '{table_dir}')")
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW snap_sql_v0 "
        f"USING snapshot_table OPTIONS (path '{table_dir}', "
        f"version '0')")
    agg_sql = ("SELECT {sec} AS section, event_type, "
               "CAST(COUNT(*) AS BIGINT) AS n_events, "
               "CAST(SUM(cents) AS BIGINT) AS cents "
               "FROM {view} {where} GROUP BY event_type")
    not_band = "WHERE event_type <> '__null_band__'"
    sql_head = spark.sql(agg_sql.format(sec="'sql_head'",
                                        view="snap_sql_head",
                                        where=not_band))
    sql_v0 = spark.sql(agg_sql.format(sec="'sql_v0'",
                                      view="snap_sql_v0", where=""))
    api_head = (
        snapshot_read(spark, table_dir)
        .filter(F.col("event_type") != "__null_band__")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("cents").alias("cents"))
        .select(F.lit("api_head").alias("section"), "event_type",
                "n_events", "cents"))

    # pushdown pins: the reader, probed with each predicate shape,
    # must plan strictly fewer files than the table holds (and the
    # null-safe-NULL probe exactly the null band)
    from pyspark.sql.datasource import (EqualNullSafe, EqualTo,
                                        GreaterThanOrEqual, IsNotNull,
                                        Not)

    from ..sources.snapshot_source import SnapshotTablePushdownReader

    schema = snapshot_read(spark, table_dir).schema

    def planned(filters) -> int:
        probe = SnapshotTablePushdownReader({"path": table_dir}, schema)
        list(probe.pushFilters(filters))
        return sum(1 for p in probe.partitions()
                   if p.abs_path is not None)

    total_files = planned([])
    for label, filters, expect in [
        # band predicate → drops the pre-cut band and the null band
        ("day >= cut", [GreaterThanOrEqual(("day",), cut)],
         lambda n: 0 < n < total_files),
        # r12: IS NOT NULL prunes the provably-all-NULL band file
        ("cents IS NOT NULL", [IsNotNull(("cents",))],
         lambda n: 0 < n < total_files),
        # r12: NOT(=) prunes the constant-column band file
        ("event_type != band", [Not(EqualTo(("event_type",),
                                            "__null_band__"))],
         lambda n: 0 < n < total_files),
        # r12: <=> NULL keeps ONLY files that may hold a null
        ("cents <=> NULL", [EqualNullSafe(("cents",), None)],
         lambda n: 0 < n < total_files),
    ]:
        n = planned(filters)
        if not expect(n):
            raise RuntimeError(
                f"snapshot_sql_surface_parity: pushFilters planned "
                f"{n}/{total_files} files for {label} — the SQL "
                "surface is not stats-pruning that shape")
    # single-filter-shape pushdown view (see docstring: opt-in, one
    # shape per relation — re-executions of this same plan re-prune
    # the same shape, which is exact)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW snap_sql_pruned "
        f"USING snapshot_table OPTIONS (path '{table_dir}', "
        f"pushdown 'true')")
    sql_pruned = spark.sql(
        "SELECT 'sql_pruned' AS section, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(cents) AS BIGINT) AS cents "
        f"FROM snap_sql_pruned WHERE day >= '{cut}' GROUP BY event_type")
    # r12: IS NOT NULL through PURE SQL on its own single-shape
    # pushdown view — the null band must vanish without its group ever
    # existing (the fixture holds no NULL cents, so the remaining
    # groups equal head exactly; the oracle restates head)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW snap_sql_notnull "
        f"USING snapshot_table OPTIONS (path '{table_dir}', "
        f"pushdown 'true')")
    sql_notnull = spark.sql(
        "SELECT 'sql_notnull' AS section, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(cents) AS BIGINT) AS cents "
        "FROM snap_sql_notnull WHERE cents IS NOT NULL "
        "GROUP BY event_type")
    return (sql_head.unionByName(api_head).unionByName(sql_v0)
            .unionByName(sql_pruned).unionByName(sql_notnull))


# ---------------------------------------------------------------------------
# r11: retention — expire old versions, sweep only unreferenced data.
# ---------------------------------------------------------------------------
@query(
    "snapshot_expire_retention_parity",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY 1
    """,
)
def snapshot_expire_retention_parity(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """O(deleted) retention in the driver's hash gate (the one format
    verb with no gated row until r11): three slot appends are folded
    by a COMPACTION (v3 references only its own rewritten files), two
    more appends land, then ``snapshot_expire(keep_last=3)`` drops
    v0-v2. The query raises unless (a) exactly the three pre-compact
    commit directories are swept — they are unreferenced by any
    surviving manifest, while every survivor-referenced directory must
    remain on disk untouched; (b) the expired version is no longer
    readable and the retained ones are; (c) the incremental read over
    the surviving range still works (expire never breaks retained
    lineage). The head read then hash-matches the whole events fixture
    — retention deleted history, never data."""
    from ..operators.snapshots import (_read_manifest, snapshot_commit,
                                       snapshot_compact, snapshot_expire,
                                       snapshot_read,
                                       snapshot_read_incremental,
                                       snapshot_versions)

    table_dir = _scratch(sf_dir, "snapshot_expire_retention")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.pmod(F.col("event_id"), F.lit(5)).alias("slot"),
    )
    for s in range(3):
        snapshot_commit(spark, table_dir,
                        ev.filter(F.col("slot") == s).drop("slot"),
                        mode="append")
    snapshot_compact(spark, table_dir, target_files=2)        # v3
    for s in (3, 4):
        snapshot_commit(spark, table_dir,
                        ev.filter(F.col("slot") == s).drop("slot"),
                        mode="append")                        # v4, v5

    pre_dirs = {os.path.dirname(e["path"])
                for v in (0, 1, 2)
                for e in _read_manifest(table_dir, v)["files"]}
    keep_dirs = {os.path.dirname(e["path"])
                 for v in (3, 4, 5)
                 for e in _read_manifest(table_dir, v)["files"]}
    doomed_dirs = pre_dirs - keep_dirs
    if len(doomed_dirs) != 3:
        raise RuntimeError(
            f"snapshot_expire_retention_parity: expected the 3 "
            f"pre-compact commit dirs to be unreferenced, got "
            f"{len(doomed_dirs)} — the compaction did not fold them")

    report = snapshot_expire(table_dir, keep_last=3,
                             tmp_grace_seconds=0.0)
    if sorted(report["expired_versions"]) != [0, 1, 2]:
        raise RuntimeError(
            f"snapshot_expire_retention_parity: expired "
            f"{report['expired_versions']}, expected [0, 1, 2]")
    if sorted(report["deleted_dirs"]) != sorted(doomed_dirs):
        raise RuntimeError(
            f"snapshot_expire_retention_parity: swept "
            f"{report['deleted_dirs']} but exactly the unreferenced "
            f"dirs {sorted(doomed_dirs)} must go — a referenced dir "
            "swept = data loss; an unreferenced dir kept = leak")
    for d in keep_dirs:
        if not os.path.isdir(os.path.join(table_dir, d)):
            raise RuntimeError(
                f"snapshot_expire_retention_parity: survivor-referenced "
                f"dir {d} was deleted — retention destroyed live data")
    if snapshot_versions(table_dir) != [3, 4, 5]:
        raise RuntimeError(
            f"snapshot_expire_retention_parity: retained versions "
            f"{snapshot_versions(table_dir)}, expected [3, 4, 5]")
    try:
        snapshot_read(spark, table_dir, version=2)
        raise RuntimeError(
            "snapshot_expire_retention_parity: an expired version is "
            "still readable — retention did not take")
    except FileNotFoundError:
        pass
    # retained lineage still serves incremental consumers
    delta_n = snapshot_read_incremental(spark, table_dir, 3).count()
    expect_delta = ev.filter(F.col("slot").isin(3, 4)).count()
    if delta_n != expect_delta:
        raise RuntimeError(
            f"snapshot_expire_retention_parity: post-expire incremental "
            f"read served {delta_n} rows, expected {expect_delta}")
    return (
        snapshot_read(spark, table_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("cents").alias("cents"))
    )


# ---------------------------------------------------------------------------
# Hierarchical manifests: O(new) commit metadata + segment-level pruning
# (r12, VERDICT r11 item 1).
# ---------------------------------------------------------------------------
@query(
    "snapshot_manifest_scale_parity",
    oracle="""
    WITH ev AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               event_id % 8 AS slot
        FROM events
    )
    SELECT 'head' AS section, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM ev GROUP BY 1, 2
    UNION ALL
    SELECT 'v0', event_type, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM ev WHERE slot = 0 GROUP BY 1, 2
    UNION ALL
    SELECT 'cdf', event_type, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM ev GROUP BY 1, 2
    """,
)
def snapshot_manifest_scale_parity(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """HIERARCHICAL MANIFESTS (operators/snapshots.py, format v3 —
    VERDICT r11 item 1, its top-ranked O(table)-metadata scale-killer):
    each version's manifest is a LIST of immutable segment descriptors
    (column-stat rollups inline) reusing unchanged segments BY
    REFERENCE; file entries live in bounded segment files. Eight
    slot-banded appends (8 files each) then PIN, per append:

    (a) COMMIT METADATA IS O(new): the segment files newly referenced
        by each append's manifest contain EXACTLY that append's file
        entries (the old layout re-serialized the full cumulative list
        — 8× more by the last append, ~10^6 entries at 100 TB), and
        the manifest list itself carries ZERO file entries (every
        descriptor points under _snapshots/segments/).
    (b) SEGMENT PRUNING: a slot-banded ``snapshot_scan`` must OPEN
        fewer segment files than exist (rollup stats prune whole
        segments before any is parsed) and still plan exactly the
        band's files.
    (c) PARITY THROUGH THE LAYOUT: head read, version-0 time travel,
        and the CDF feed from version 0 all hash against DuckDB — a
        segment lost, duplicated, or mis-rolled flips a section."""
    from ..operators.snapshots import (_manifest_path, _read_manifest_meta,
                                       _segment_entries, snapshot_commit,
                                       snapshot_plan_stats,
                                       snapshot_read, snapshot_read_cdf,
                                       snapshot_scan)

    table_dir = _scratch(sf_dir, "snapshot_manifest_scale")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.pmod(F.col("event_id"), F.lit(8)).alias("slot"),
    )
    n_appends = 8
    for s in range(n_appends):
        snapshot_commit(spark, table_dir,
                        ev.filter(F.col("slot") == s).repartition(8),
                        mode="append")

    # --- pin (a): per-append serialized entries == that append's files
    seg_paths: dict[int, set] = {}
    for v in range(n_appends):
        m = _read_manifest_meta(table_dir, v)
        seg_paths[v] = {s["path"] for s in m["segments"]}
        if "files" in m or any("_snapshots" not in desc["path"]
                               for desc in m["segments"]):
            raise RuntimeError(
                "snapshot_manifest_scale_parity: the manifest list "
                "carries file entries inline — commit metadata is "
                "not O(new)")
    head_m = _read_manifest_meta(table_dir, n_appends - 1)
    head_files = sum(s["n_files"] for s in head_m["segments"])
    for v in range(1, n_appends):
        new_segs = [s for s in _read_manifest_meta(table_dir, v)["segments"]
                    if s["path"] not in seg_paths[v - 1]]
        serialized = sum(len(_segment_entries(table_dir, s))
                        for s in new_segs)
        added = (_read_manifest_meta(table_dir, v)["delta"]["files"])
        if serialized != added:
            raise RuntimeError(
                f"snapshot_manifest_scale_parity: append v{v} "
                f"serialized {serialized} entries for {added} new files "
                "— the manifest re-serialized carried state (O(table) "
                "commit metadata)")
        if head_files < 4 * serialized:
            raise RuntimeError(
                "snapshot_manifest_scale_parity: the fixture is too "
                "small to distinguish O(new) from O(table) metadata")
    # the manifest list bytes grow by descriptors only, never entries:
    # last manifest < first manifest + a per-descriptor budget
    first_b = os.path.getsize(_manifest_path(table_dir, 0))
    last_b = os.path.getsize(_manifest_path(table_dir, n_appends - 1))
    if last_b > first_b + (n_appends - 1) * 1024:
        raise RuntimeError(
            f"snapshot_manifest_scale_parity: manifest list grew "
            f"{first_b} -> {last_b} bytes over {n_appends} appends — "
            "more than descriptor growth; entries are leaking into the "
            "list")

    # --- pin (b): a slot-banded scan opens fewer segments than exist
    stats = snapshot_plan_stats(table_dir, [("slot", "=", 3)])
    if not (stats["segments_opened"] < stats["segments_total"]
            and stats["segments_opened"] >= 1):
        raise RuntimeError(
            f"snapshot_manifest_scale_parity: banded scan opened "
            f"{stats['segments_opened']}/{stats['segments_total']} "
            "segments — rollup stats did not prune at segment level")
    if stats["files_kept"] >= stats["files_total"]:
        raise RuntimeError(
            "snapshot_manifest_scale_parity: banded scan planned every "
            "file — file-level pruning lost under the segment layout")
    banded = snapshot_scan(spark, table_dir, [("slot", "=", 3)])
    expect_banded = ev.filter(F.col("slot") == 3).count()
    if banded.count() != expect_banded:
        raise RuntimeError(
            "snapshot_manifest_scale_parity: the segment-pruned scan "
            "lost rows")

    # --- pin (c): parity through head / time travel / CDF
    def agg(df: DataFrame, section: str) -> DataFrame:
        return (df.groupBy("event_type")
                .agg(F.count("*").alias("n"),
                     F.sum("cents").alias("cents"))
                .select(F.lit(section).alias("section"), "event_type",
                        "n", "cents"))

    head = agg(snapshot_read(spark, table_dir).drop("slot"), "head")
    v0 = agg(snapshot_read(spark, table_dir, version=0).drop("slot"),
             "v0")
    feed = snapshot_read_cdf(spark, table_dir, 0)
    bad_types = feed.filter(F.col("_change_type") != "I").count()
    if bad_types:
        raise RuntimeError(
            "snapshot_manifest_scale_parity: an append-only feed "
            "served non-I change rows")
    cdf0 = snapshot_read(spark, table_dir, version=0) \
        .withColumn("_change_type", F.lit("I"))
    cdf = agg(feed.unionByName(cdf0, allowMissingColumns=True)
              .drop("_commit_version", "_change_type", "slot"), "cdf")
    return head.unionByName(v0).unionByName(cdf)


# ---------------------------------------------------------------------------
# Deletion vectors: merge-on-read DELETE WHERE (r12, VERDICT r11 item 2).
# ---------------------------------------------------------------------------
@query(
    "snapshot_deletion_vector_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 1200
    ),
    del1 AS (
        SELECT * FROM base
        WHERE k > 400 AND k <= 600 AND pri = '1-URGENT'
    ),
    del2 AS (
        SELECT * FROM base
        WHERE k > 500 AND k <= 900 AND pri IN ('1-URGENT', '2-HIGH')
          AND k NOT IN (SELECT k FROM del1)
    )
    SELECT 'final' AS section, k, pri, cents FROM base
    WHERE k NOT IN (SELECT k FROM del1)
      AND k NOT IN (SELECT k FROM del2)
    UNION ALL SELECT 'deleted', k, pri, cents FROM del1
    UNION ALL SELECT 'deleted', k, pri, cents FROM del2
    UNION ALL SELECT 'base', k, pri, cents FROM base
    """,
)
def snapshot_deletion_vector_parity(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """DELETION VECTORS — merge-on-read deletes
    (operators/snapshots.py:snapshot_delete_where; VERDICT r11 item 2:
    copy-on-write rewrites whole bands for a k-row delete; at 100 TB a
    trickle of CDC deletes rewrites the table daily). Three key-band
    appends, then TWO predicate deletes (the second overlaps the first,
    exercising vector SUPERSESSION — old ∪ new positions), then an
    OPTIMIZE. Pinned in-gate:

    (a) O(delete), not O(band): across BOTH delete commits every data
        file on disk stays BYTE-IDENTICAL (sha1 compared) and the head
        manifest references exactly the same data paths — the property
        copy-on-write cannot give (its gate pins carried-file identity
        for UNTOUCHED files only; here even the touched files never
        rewrite).
    (b) The delete is scoped: only the dirty band's files gain a
        vector (files_touched < table files).
    (c) OPTIMIZE materializes the vectors away: the compacted manifest
        carries no ``dv`` entries and the data is unchanged.

    Hash sections: ``final`` (head after both deletes + compaction,
    which must equal the COW-twin semantics the oracle states as plain
    NOT IN filters), ``deleted`` (the CDF's D rows across both delete
    commits — old values, already-deleted rows never re-logged, zero
    rows from the compaction), ``base`` (time travel to the pre-delete
    version — vectors never touch history)."""
    import hashlib

    from ..operators.snapshots import (_read_manifest, snapshot_commit,
                                       snapshot_compact,
                                       snapshot_current_version,
                                       snapshot_delete_where,
                                       snapshot_read, snapshot_read_cdf)

    table_dir = _scratch(sf_dir, "snapshot_deletion_vector")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    base = orders.filter(F.col("o_orderkey") <= 1200).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    for band in [F.col("k") <= 400,
                 (F.col("k") > 400) & (F.col("k") <= 800),
                 F.col("k") > 800]:
        snapshot_commit(spark, table_dir, base.filter(band).coalesce(1),
                        mode="append")
    base_version = snapshot_current_version(table_dir)

    def data_shas() -> dict:
        out = {}
        for root, _, files in os.walk(os.path.join(table_dir, "data")):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    with open(p, "rb") as fh:
                        out[p] = hashlib.sha1(fh.read()).hexdigest()
        return out

    pre_shas = data_shas()
    pre_paths = {e["path"]
                 for e in _read_manifest(table_dir, base_version)["files"]}
    v1, info1 = snapshot_delete_where(
        spark, table_dir,
        [("k", ">", 400), ("k", "<=", 600), ("pri", "=", "1-URGENT")],
        key="k")
    v2, info2 = snapshot_delete_where(
        spark, table_dir,
        [("k", ">", 500), ("k", "<=", 900),
         ("pri", "in", ["1-URGENT", "2-HIGH"])],
        key="k")
    # (a) zero data-file rewrites — byte identity across both deletes
    if data_shas() != pre_shas:
        raise RuntimeError(
            "snapshot_deletion_vector_parity: a data file changed on "
            "disk — the merge-on-read delete copy-on-wrote")
    post = _read_manifest(table_dir, v2)["files"]
    if {e["path"] for e in post} != pre_paths:
        raise RuntimeError(
            "snapshot_deletion_vector_parity: the delete commit "
            "changed the data file set — expected vectors only")
    if info1["files_rewritten"] or info2["files_rewritten"]:
        raise RuntimeError(
            "snapshot_deletion_vector_parity: the verb reported "
            "rewritten files")
    # (b) scoped: only the dirty band gained vectors
    dv_files = [e for e in post if e.get("dv")]
    if not (0 < len(dv_files) < len(post)):
        raise RuntimeError(
            f"snapshot_deletion_vector_parity: {len(dv_files)} of "
            f"{len(post)} files carry vectors — the delete was not "
            "band-scoped")
    if info1["rows_deleted"] == 0 or info2["rows_deleted"] == 0:
        raise RuntimeError(
            "snapshot_deletion_vector_parity: a delete matched no rows "
            "— the fixture bands are wrong")
    # the CDF rides through BOTH deletes (captured before compaction
    # only by range: compaction contributes zero rows by contract)
    feed = snapshot_read_cdf(spark, table_dir, base_version)
    # (c) OPTIMIZE materializes vectors away
    v3, _, _ = snapshot_compact(spark, table_dir, target_files=2)
    if any(e.get("dv") for e in _read_manifest(table_dir, v3)["files"]):
        raise RuntimeError(
            "snapshot_deletion_vector_parity: compaction carried "
            "deletion vectors forward instead of materializing them")
    bad = feed.filter(F.col("_change_type") != "D").count()
    if bad:
        raise RuntimeError(
            f"snapshot_deletion_vector_parity: the delete feed served "
            f"{bad} non-D rows")
    final = snapshot_read(spark, table_dir).select(
        F.lit("final").alias("section"), "k", "pri", "cents")
    deleted = feed.select(F.lit("deleted").alias("section"),
                          "k", "pri", "cents")
    base_tt = snapshot_read(spark, table_dir,
                            version=base_version).select(
        F.lit("base").alias("section"), "k", "pri", "cents")
    return final.unionByName(deleted).unionByName(base_tt)


# ---------------------------------------------------------------------------
# Conflict narrowing: rewrites rebase over disjoint appends (r12,
# VERDICT r11 item 3).
# ---------------------------------------------------------------------------
@query(
    "snapshot_conflict_rebase_parity",
    oracle="""
    WITH ord AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    keys AS (
        SELECT DISTINCT k FROM ord
        WHERE (k <= 1200 AND k % 4 != 1)
           OR (k > 1200 AND k <= 1400)
           OR (k > 300 AND k <= 400 AND k % 4 = 1)
           OR (k > 100 AND k <= 300)
           OR (k > 300 AND k <= 500)
    )
    SELECT o.k, o.pri,
           CASE WHEN o.k > 100 AND o.k <= 300 THEN o.cents * 2
                WHEN o.k > 300 AND o.k <= 500 THEN o.cents * 3
                ELSE o.cents END AS cents
    FROM ord o JOIN keys USING (k)
    """,
)
def snapshot_conflict_rebase_parity(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """CONFLICT NARROWING for rewrite verbs (operators/snapshots.py
    :_publish_commit + _disjoint_append_segments; VERDICT r11 item 3:
    the OCC loop aborted a merge when ANY commit interleaved, even a
    provably-disjoint append — at high commit rates that serializes
    all writers; Iceberg validates and rebases instead). Deterministic
    interleave through the real API (``snapshot_merge(base_version=N)``
    — the long-running-job shape where commits land between read and
    publish):

    1. Two band appends (k ≤ 600, 600 < k ≤ 1200; every 4th key
       withheld so merges also insert). A DISJOINT append
       (1200 < k ≤ 1400) lands, then a merge DERIVED FROM THE
       PRE-APPEND READ ((100,300] doubled) publishes: it must REBASE —
       no abort, exactly one new version, and the interleaved append's
       files present in the committed manifest — because carrying a
       disjoint append reproduces the serial order append→merge.
    2. An append INSIDE the next merge's band lands ((300,400] of the
       withheld keys); a merge derived from the pre-append read
       ((300,500] tripled) must ABORT with SnapshotConflictError (the
       serial merge would have matched those rows); the re-read merge
       then succeeds.

    The hash compares the final table against the oracle's serial
    restatement — a rebase that dropped the append, resurrected a
    replaced file, or mis-scoped the band flips it."""
    from ..operators.snapshots import (SnapshotConflictError,
                                       _read_manifest, snapshot_commit,
                                       snapshot_current_version,
                                       snapshot_merge, snapshot_read)

    table_dir = _scratch(sf_dir, "snapshot_conflict_rebase")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    ord_all = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = ord_all.filter((F.col("k") <= 1200) & (F.col("k") % 4 != 1))
    snapshot_commit(spark, table_dir,
                    base.filter(F.col("k") <= 600).coalesce(1))
    snapshot_commit(spark, table_dir,
                    base.filter(F.col("k") > 600).coalesce(1),
                    mode="append")
    read_v = snapshot_current_version(table_dir)          # = 1

    # the disjoint interleaver (its file paths must survive the rebase)
    ext = ord_all.filter((F.col("k") > 1200) & (F.col("k") <= 1400))
    snapshot_commit(spark, table_dir, ext.coalesce(1), mode="append")
    ext_paths = ({e["path"] for e in
                  _read_manifest(table_dir, read_v + 1)["files"]}
                 - {e["path"] for e in
                    _read_manifest(table_dir, read_v)["files"]})

    upd1 = ord_all.filter((F.col("k") > 100) & (F.col("k") <= 300)) \
        .withColumn("cents", F.col("cents") * 2)
    v_merge, _ = snapshot_merge(spark, table_dir, upd1, "k",
                                base_version=read_v)
    if v_merge != read_v + 2:
        raise RuntimeError(
            f"snapshot_conflict_rebase_parity: the rebased merge "
            f"committed version {v_merge}, expected {read_v + 2} "
            "(exactly one version on top of the interleaved append)")
    head_paths = {e["path"]
                  for e in _read_manifest(table_dir, v_merge)["files"]}
    if not ext_paths <= head_paths:
        raise RuntimeError(
            "snapshot_conflict_rebase_parity: the rebase DROPPED the "
            "interleaved append's files — lost update")

    # in-band interleaver → the stale-read merge must abort
    inband = ord_all.filter(
        (F.col("k") > 300) & (F.col("k") <= 400) & (F.col("k") % 4 == 1))
    if inband.isEmpty():
        raise RuntimeError(
            "snapshot_conflict_rebase_parity: fixture holds no "
            "withheld keys in (300, 400] — the abort leg is vacuous")
    stale_v = snapshot_current_version(table_dir)
    snapshot_commit(spark, table_dir, inband.coalesce(1), mode="append")
    upd2 = ord_all.filter((F.col("k") > 300) & (F.col("k") <= 500)) \
        .withColumn("cents", F.col("cents") * 3)
    try:
        snapshot_merge(spark, table_dir, upd2, "k", base_version=stale_v)
        raise RuntimeError(
            "snapshot_conflict_rebase_parity: a merge derived from a "
            "stale read published over an IN-BAND append — the narrow "
            "check is not narrow enough (lost rows)")
    except SnapshotConflictError:
        pass
    snapshot_merge(spark, table_dir, upd2, "k")  # fresh read succeeds
    return snapshot_read(spark, table_dir)


# ---------------------------------------------------------------------------
# Partition-spec transforms: exact partition pruning + whole-partition
# retirement (r12, VERDICT r11 item 4).
# ---------------------------------------------------------------------------
@query(
    "snapshot_partition_spec_parity",
    oracle="""
    WITH ev AS (
        SELECT event_id, event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT 'day' AS section, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM ev WHERE day = '2024-01-20' GROUP BY 1, 2
    UNION ALL
    SELECT 'head', event_type, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM ev WHERE day >= '2024-01-15' GROUP BY 1, 2
    UNION ALL
    SELECT 'base', event_type, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM ev GROUP BY 1, 2
    UNION ALL
    SELECT 'mixed', event_type, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM (
        SELECT event_type, cents FROM ev WHERE day = '2024-01-20'
        UNION ALL
        SELECT event_type, cents FROM ev
        WHERE day = '2024-01-20' AND event_id % 7 = 0
    ) GROUP BY 1, 2
    """,
)
def snapshot_partition_spec_parity(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """PARTITION-SPEC TRANSFORMS in the manifest (operators/snapshots
    .py:snapshot_commit_partitioned / snapshot_drop_partitions; VERDICT
    r11 item 4: entries pruned only by footer stats; the reference's
    own date/month output partitioning, reference top10.py:266-268 and
    platform_usage.py:210, deserved a first-class spec). Events commit
    under a hidden ``day = day(ts)`` spec as TWO interleaving appends
    (both span all 30 days — a day's files live in both commits), then:

    (a) EXACT pruning: ``snapshot_scan(day = '2024-01-10')`` must plan
        EXACTLY the files whose manifest partition tuple is that day —
        across both commits, strictly fewer than the table, with NO
        residual row filter (the field is metadata-only; the tuple
        guarantees every surviving row — hashed as the ``day``
        section).
    (b) WHOLE-PARTITION RETIREMENT: ``snapshot_drop_partitions(day <
        '2024-01-15')`` is a metadata-only commit — exactly the
        matching files drop (no data file read except the O(dropped)
        D-row change log), the CDF serves those D rows, time travel
        still reads the full fixture (``base`` section), and the head
        (``head`` section) hashes as the surviving days.
    (c) FILE-LEVEL GC: after ``snapshot_expire`` retires the pre-drop
        versions, EXACTLY the dropped day's files are swept from the
        shared commit dirs (file-granular — the dirs still hold live
        siblings) and every surviving file remains on disk.
    (d) MIXED GENERATIONS (r13, VERDICT r12 item 4 — replacing the
        r12 refusal): a PLAIN (un-tupled) append interleaves, then a
        partition-field scan serves BOTH generations — exact file
        pruning for the tupled one, the spec's inverse as a row
        filter for the other — pinned to plan exactly (tupled
        day files + all un-tupled files) and hashed as ``mixed``."""
    from ..operators.snapshots import (_read_manifest,
                                       snapshot_commit_partitioned,
                                       snapshot_current_version,
                                       snapshot_drop_partitions,
                                       snapshot_expire,
                                       snapshot_pruned_files,
                                       snapshot_read, snapshot_read_cdf,
                                       snapshot_scan)

    table_dir = _scratch(sf_dir, "snapshot_partition_spec")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_id", "ts", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    spec = [{"name": "day", "source": "ts", "transform": "day"}]
    # pre-partition each batch BY THE TRANSFORM so partitionBy writes
    # one file per day per commit (30 × 2), not one per day per task
    # (~2000 tiny files — measured 4× slower end-to-end); production
    # would do exactly this repartition before a partitioned write
    day_expr = F.date_format("ts", "yyyy-MM-dd")
    snapshot_commit_partitioned(
        spark, table_dir,
        ev.filter(F.col("event_id") % 2 == 0).repartition(30, day_expr),
        spec)
    snapshot_commit_partitioned(
        spark, table_dir,
        ev.filter(F.col("event_id") % 2 == 1).repartition(30, day_expr),
        spec, mode="append")
    base_version = snapshot_current_version(table_dir)
    entries = _read_manifest(table_dir, base_version)["files"]
    the_day = "2024-01-20"
    day_paths = {e["path"] for e in entries
                 if e["partition"]["day"] == the_day}
    if not day_paths or len(day_paths) >= len(entries):
        raise RuntimeError(
            "snapshot_partition_spec_parity: the fixture day split is "
            "degenerate — no pruning to pin")
    kept, total = snapshot_pruned_files(table_dir,
                                        [("day", "=", the_day)])
    if set(kept) != day_paths:
        raise RuntimeError(
            f"snapshot_partition_spec_parity: the day scan planned "
            f"{len(kept)} files, expected exactly the {len(day_paths)} "
            "files of that partition — partition pruning is not exact")
    day_df = snapshot_scan(spark, table_dir, [("day", "=", the_day)])

    cut = "2024-01-15"
    drop_paths = {e["path"] for e in entries
                  if e["partition"]["day"] < cut}
    v_drop, info = snapshot_drop_partitions(
        spark, table_dir, [("day", "<", cut)], key="event_id")
    if info["files_dropped"] != len(drop_paths):
        raise RuntimeError(
            f"snapshot_partition_spec_parity: dropped "
            f"{info['files_dropped']} files, expected {len(drop_paths)}")
    expect_dropped_rows = ev.filter(
        F.date_format("ts", "yyyy-MM-dd") < cut).count()
    if info["rows_dropped"] != expect_dropped_rows:
        raise RuntimeError(
            f"snapshot_partition_spec_parity: dropped "
            f"{info['rows_dropped']} rows, expected "
            f"{expect_dropped_rows}")
    feed = snapshot_read_cdf(spark, table_dir, base_version)
    if (feed.count() != expect_dropped_rows
            or feed.filter(F.col("_change_type") != "D").count()):
        raise RuntimeError(
            "snapshot_partition_spec_parity: the drop's change feed "
            "is not exactly the dropped rows as D")
    # materialize the time-travel section BEFORE retention sweeps the
    # dropped files (the pre-drop manifests are about to expire)
    base_agg = (snapshot_read(spark, table_dir, version=base_version)
                .groupBy("event_type")
                .agg(F.count("*").alias("n"),
                     F.sum("cents").alias("cents"))
                .select(F.lit("base").alias("section"), "event_type",
                        "n", "cents")
                .localCheckpoint(eager=True))

    swept = snapshot_expire(table_dir, keep_last=1,
                            tmp_grace_seconds=0)
    if set(swept["deleted_files"]) != drop_paths:
        raise RuntimeError(
            f"snapshot_partition_spec_parity: expire swept "
            f"{len(swept['deleted_files'])} files, expected exactly "
            f"the {len(drop_paths)} dropped partition files")
    for e in entries:
        if e["path"] not in drop_paths and not os.path.isfile(
                os.path.join(table_dir, e["path"])):
            raise RuntimeError(
                "snapshot_partition_spec_parity: expire deleted a "
                f"LIVE file {e['path']} — data loss")

    def agg(df: DataFrame, section: str) -> DataFrame:
        return (df.groupBy("event_type")
                .agg(F.count("*").alias("n"),
                     F.sum("cents").alias("cents"))
                .select(F.lit(section).alias("section"), "event_type",
                        "n", "cents"))

    head_agg = agg(snapshot_read(spark, table_dir), "head")

    # (d) mixed generations: a plain un-tupled append, then a
    # partition-field scan across BOTH generations
    from ..operators.snapshots import (snapshot_commit,
                                       snapshot_current_version)
    from ..operators.snapshots import _read_manifest as _rm

    extra = ev.filter((F.col("event_id") % 7 == 0)
                      & (F.date_format("ts", "yyyy-MM-dd") == the_day))
    snapshot_commit(spark, table_dir, extra.coalesce(1), mode="append")
    mixed_m = _rm(table_dir, snapshot_current_version(table_dir))
    want_mixed = {e["path"] for e in mixed_m["files"]
                  if e.get("partition", {}).get("day") == the_day
                  or not e.get("partition")}
    kept_mixed, _total = snapshot_pruned_files(
        table_dir, [("day", "=", the_day)])
    if set(kept_mixed) != want_mixed:
        raise RuntimeError(
            "snapshot_partition_spec_parity: mixed-generation scan "
            f"planned {len(kept_mixed)} files, expected the tupled "
            f"day files plus every un-tupled file "
            f"({len(want_mixed)})")
    mixed_df = snapshot_scan(spark, table_dir, [("day", "=", the_day)])

    return (agg(day_df, "day")
            .unionByName(head_agg)
            .unionByName(base_agg)
            .unionByName(agg(mixed_df, "mixed")))


# ---------------------------------------------------------------------------
# CHECK constraints: Delta's ADD CONSTRAINT as a table property (r12).
# ---------------------------------------------------------------------------
@query(
    "snapshot_check_constraint_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 800
    ),
    upd AS (
        SELECT k, pri, cents * 2 AS cents FROM base
        WHERE k > 200 AND k <= 400
    )
    SELECT COALESCE(u.k, b.k) AS k,
           COALESCE(u.pri, b.pri) AS pri,
           COALESCE(u.cents, b.cents) AS cents
    FROM base b FULL OUTER JOIN upd u ON b.k = u.k
    """,
)
def snapshot_check_constraint_parity(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """CHECK CONSTRAINTS as table properties
    (operators/snapshots.py:snapshot_add_constraint /
    _enforce_constraints — Delta's ``ALTER TABLE ... ADD CONSTRAINT
    ... CHECK``, a governance surface the format lacked): the
    constraint lands as a METADATA-ONLY commit (pinned: the manifest
    adopts the prior segments by reference and the CDF serves zero
    rows across it) after validating the existing head fail-closed
    (pinned: a constraint the head violates is refused). Every
    data-adding verb then enforces it against its WRITTEN files
    before publication: the gate pins that a violating APPEND and a
    violating MERGE both abort with NO version published (an
    unreferenced dir is the only residue — expire's garbage), that a
    NULL-evaluating row passes (SQL CHECK's unknown-passes rule,
    Delta's too), and that a clean merge lands normally. The hash
    compares the final table against the oracle's restatement — an
    enforcement path that silently dropped or mangled the clean
    merge's rows flips it."""
    from ..operators.snapshots import (_read_manifest_meta,
                                       snapshot_add_constraint,
                                       snapshot_commit,
                                       snapshot_current_version,
                                       snapshot_merge, snapshot_read,
                                       snapshot_read_cdf)

    table_dir = _scratch(sf_dir, "snapshot_check_constraint")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    base = orders.filter(F.col("o_orderkey") <= 800).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    snapshot_commit(spark, table_dir,
                    base.filter(F.col("k") <= 400).coalesce(1))
    snapshot_commit(spark, table_dir,
                    base.filter(F.col("k") > 400).coalesce(1),
                    mode="append")
    pre = _read_manifest_meta(table_dir,
                              snapshot_current_version(table_dir))
    v_add = snapshot_add_constraint(spark, table_dir, "valid_row",
                                    "cents >= 0 AND pri IS NOT NULL")
    m_add = _read_manifest_meta(table_dir, v_add)
    if [s["path"] for s in m_add["segments"]] != \
            [s["path"] for s in pre["segments"]]:
        raise RuntimeError(
            "snapshot_check_constraint_parity: ADD CONSTRAINT "
            "re-serialized segments — not metadata-only")
    if snapshot_read_cdf(spark, table_dir, v_add - 1).count():
        raise RuntimeError(
            "snapshot_check_constraint_parity: the constraint commit "
            "emitted change rows")

    # violating APPEND and MERGE must abort with NO version published
    bad_append = inline_dim(spark, [(9001, "1-URGENT", -5)],
                            "k long, pri string, cents long")
    bad_merge = inline_dim(spark, [(10, None, 123)],
                           "k long, pri string, cents long")
    for label, attempt in [
        ("append", lambda: snapshot_commit(spark, table_dir,
                                           bad_append.coalesce(1))),
        ("merge", lambda: snapshot_merge(spark, table_dir,
                                         bad_merge, "k")),
    ]:
        head = snapshot_current_version(table_dir)
        try:
            attempt()
            raise RuntimeError(
                f"snapshot_check_constraint_parity: a violating "
                f"{label} published — the constraint is not enforced")
        except ValueError as exc:
            if "valid_row" not in str(exc):
                raise
        if snapshot_current_version(table_dir) != head:
            raise RuntimeError(
                f"snapshot_check_constraint_parity: the aborted "
                f"{label} still advanced the version")

    # a constraint the HEAD violates is refused (fail-closed add)
    try:
        snapshot_add_constraint(spark, table_dir, "tiny", "cents < 100")
        raise RuntimeError(
            "snapshot_check_constraint_parity: a head-violating "
            "constraint was accepted")
    except ValueError as exc:
        if "violates" not in str(exc):
            raise

    # the clean merge lands and the final state hashes
    upd = base.filter((F.col("k") > 200) & (F.col("k") <= 400)) \
        .withColumn("cents", F.col("cents") * 2)
    snapshot_merge(spark, table_dir, upd, "k")
    return snapshot_read(spark, table_dir)


# ---------------------------------------------------------------------------
# Partitioned deletion vectors + IN pruning + spec-preserving OPTIMIZE
# (r13, ADVICE r12: the DV path regex silently no-op'ed deletes on
# partitioned tables; partition-field IN was unreachable; compaction
# stripped partition tuples).
# ---------------------------------------------------------------------------
@query(
    "snapshot_partitioned_delete_parity",
    oracle="""
    WITH ev AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT 'base' AS section, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM ev GROUP BY 1, 2
    UNION ALL
    SELECT 'in_days', event_type, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM ev WHERE day IN ('2024-01-10', '2024-01-20')
      AND event_type <> 'purchase' GROUP BY 1, 2
    UNION ALL
    SELECT 'head', event_type, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM ev WHERE event_type <> 'purchase' AND day >= '2024-01-05'
    GROUP BY 1, 2
    """,
)
def snapshot_partitioned_delete_parity(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """The three ADVICE r12 partition-surface fixes, composed as one
    lifecycle on a hidden-partitioned events table
    (operators/snapshots.py:snapshot_delete_where /
    _partition_term_match / snapshot_compact):

    (a) DELETE on a PARTITIONED table via deletion vectors — the r12
        path regex only matched flat 3-component layouts, so positions
        recorded under path '', the vector attached to NO entry, and
        the delete silently no-op'ed while publishing rows_deleted>0
        and a D-row log. Pinned: rows really gone from every read,
        every data file BYTE-IDENTICAL (sha1), vectors attached to
        real entries, D-feed == deleted rows.
    (b) Partition-field IN — previously unreachable (the scalar type
        guard ran first), so IN either raised or never pruned.
        Pinned: the planned file set is EXACTLY the two days' tupled
        files (hashed as the ``in_days`` section, read THROUGH the
        vectors).
    (c) OPTIMIZE preserves the partition spec — previously the
        compacted entries lost their tuples, demoting the table to
        stats-only pruning and breaking snapshot_drop_partitions.
        Pinned: every compacted entry carries a complete tuple, and a
        post-compact metadata-only drop retires exact days (``head``
        section). ``base`` is pre-delete time travel."""
    import hashlib

    from ..operators.snapshots import (_read_manifest,
                                       snapshot_commit_partitioned,
                                       snapshot_compact,
                                       snapshot_current_version,
                                       snapshot_delete_where,
                                       snapshot_drop_partitions,
                                       snapshot_pruned_files,
                                       snapshot_read, snapshot_read_cdf,
                                       snapshot_scan)

    table_dir = _scratch(sf_dir, "snapshot_partitioned_delete")
    ev = load_table(spark, sf_dir, "events", rebalance=False).select(
        "event_id", "ts", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    day_of = F.date_format("ts", "yyyy-MM-dd")
    spec = [{"name": "day", "source": "ts", "transform": "day"}]
    snapshot_commit_partitioned(
        spark, table_dir,
        ev.filter(F.col("event_id") % 2 == 0).repartition(30, day_of),
        spec)
    snapshot_commit_partitioned(
        spark, table_dir,
        ev.filter(F.col("event_id") % 2 == 1).repartition(30, day_of),
        spec, mode="append")
    base_version = snapshot_current_version(table_dir)

    def data_shas() -> dict:
        out = {}
        for root, _, files in os.walk(os.path.join(table_dir, "data")):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    with open(p, "rb") as fh:
                        out[p] = hashlib.sha1(fh.read()).hexdigest()
        return out

    pre_shas = data_shas()
    expect_deleted = ev.filter(F.col("event_type") == "purchase").count()
    v_del, info = snapshot_delete_where(
        spark, table_dir, [("event_type", "=", "purchase")],
        key="event_id")
    if info["rows_deleted"] != expect_deleted or info["files_rewritten"]:
        raise RuntimeError(
            f"snapshot_partitioned_delete_parity: delete reported "
            f"{info} — expected {expect_deleted} rows, 0 rewrites")
    if data_shas() != pre_shas:
        raise RuntimeError(
            "snapshot_partitioned_delete_parity: a data file changed "
            "on disk — the partitioned delete copy-on-wrote")
    m_del = _read_manifest(table_dir, v_del)
    dv_entries = [e for e in m_del["files"] if e.get("dv")]
    if not dv_entries or not all(e["path"] for e in m_del["files"]):
        raise RuntimeError(
            "snapshot_partitioned_delete_parity: no vector attached "
            "to a real entry — the path-extraction bug shape")
    left = snapshot_read(spark, table_dir).filter(
        F.col("event_type") == "purchase").count()
    if left:
        raise RuntimeError(
            f"snapshot_partitioned_delete_parity: {left} deleted rows "
            "still readable — the delete silently no-op'ed")
    feed = snapshot_read_cdf(spark, table_dir, base_version)
    if (feed.count() != expect_deleted
            or feed.filter(F.col("_change_type") != "D").count()):
        raise RuntimeError(
            "snapshot_partitioned_delete_parity: the delete feed is "
            "not exactly the deleted rows as D")

    # (b) partition-field IN: exact planned files, through the vectors
    days = ["2024-01-10", "2024-01-20"]
    want = {e["path"] for e in m_del["files"]
            if e["partition"]["day"] in days}
    kept, total = snapshot_pruned_files(table_dir, [("day", "in", days)])
    if set(kept) != want or not (0 < len(kept) < total):
        raise RuntimeError(
            f"snapshot_partitioned_delete_parity: IN planned "
            f"{len(kept)} files, expected exactly {len(want)} of "
            f"{total}")
    in_days_df = snapshot_scan(spark, table_dir, [("day", "in", days)])

    # (c) OPTIMIZE keeps the spec and the tuples
    v_c, before, after = snapshot_compact(spark, table_dir,
                                          target_files=4)
    m_c = _read_manifest(table_dir, v_c)
    if m_c["partition_spec"] != spec:
        raise RuntimeError(
            "snapshot_partitioned_delete_parity: compaction dropped "
            "the partition spec")
    if not all(e.get("partition", {}).get("day") for e in m_c["files"]):
        raise RuntimeError(
            "snapshot_partitioned_delete_parity: a compacted entry "
            "lost its partition tuple — OPTIMIZE demoted the table")
    if any(e.get("dv") for e in m_c["files"]):
        raise RuntimeError(
            "snapshot_partitioned_delete_parity: compaction carried "
            "vectors instead of materializing them")
    cut = "2024-01-05"
    expect_drop = ev.filter((day_of < cut)
                            & (F.col("event_type") != "purchase")
                            ).count()
    v_d, dinfo = snapshot_drop_partitions(spark, table_dir,
                                          [("day", "<", cut)])
    if dinfo["rows_dropped"] != expect_drop:
        raise RuntimeError(
            f"snapshot_partitioned_delete_parity: post-compact drop "
            f"retired {dinfo['rows_dropped']} rows, expected "
            f"{expect_drop}")

    def agg(df: DataFrame, section: str) -> DataFrame:
        return (df.groupBy("event_type")
                .agg(F.count("*").alias("n"),
                     F.sum("cents").alias("cents"))
                .select(F.lit(section).alias("section"), "event_type",
                        "n", "cents"))

    return (agg(snapshot_read(spark, table_dir, version=base_version),
                "base")
            .unionByName(agg(in_days_df, "in_days"))
            .unionByName(agg(snapshot_read(spark, table_dir), "head")))


# ---------------------------------------------------------------------------
# Metadata-conflict detection in the OCC loop (r13, VERDICT r12 item 1).
# ---------------------------------------------------------------------------
@query(
    "snapshot_metadata_conflict_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 900
    )
    SELECT k, pri,
           CASE WHEN k > 100 AND k <= 300 THEN cents * 2
                WHEN k > 300 AND k <= 500 THEN cents * 3
                ELSE cents END AS cents
    FROM base
    """,
)
def snapshot_metadata_conflict_parity(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """METADATA-CONFLICT DETECTION (operators/snapshots.py
    :_publish_commit + _is_metadata_only_commit; VERDICT r12 item 1:
    the OCC loop validated DATA disjointness only — a CHECK constraint
    landing between a commit's write and publish was inherited without
    re-validating the already-written files, and any interleaved
    non-append commit aborted a rewrite even when it moved no data).
    Deterministic interleaves through the real API:

    (a) VIOLATING REWRITE through a constraint add: a merge DERIVED
        from the pre-add read whose rewritten files violate the new
        constraint must ABORT (ValueError, no version published) —
        before r13 it would rebase and publish contract-breaking rows.
    (b) CLEAN REWRITE through the add: same stale read, clean rows —
        REBASES through the metadata-only commit, publishes exactly
        one version, and the published manifest carries the
        constraint.
    (c) MID-FLIGHT APPEND WINDOW: a constraint lands inside an
        append's write->publish window (injected at the enforcement
        seam); the append's rows violate it -> the publish loop
        re-validates and ABORTS (the r12 docstring-only race, closed).
    (d) REBASE THROUGH MANIFEST COMPACTION: a merge derived before a
        ``snapshot_compact_manifests`` re-chunk publishes through it
        (byte-identical entry set), where r12 aborted.

    The hash compares the final table against the oracle's serial
    restatement — any leak of an aborted commit's rows flips it."""
    from ..operators import snapshots as S

    table_dir = _scratch(sf_dir, "snapshot_metadata_conflict")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    base = orders.filter(F.col("o_orderkey") <= 900).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    S.snapshot_commit(spark, table_dir,
                      base.filter(F.col("k") <= 400).coalesce(1))
    S.snapshot_commit(spark, table_dir,
                      base.filter((F.col("k") > 400)
                                  & (F.col("k") <= 800)).coalesce(1),
                      mode="append")
    stale = S.snapshot_current_version(table_dir)
    v_add = S.snapshot_add_constraint(spark, table_dir, "nonneg",
                                      "cents >= 0")

    # (a) violating rewrite derived from the pre-add read: abort
    bad_upd = base.filter((F.col("k") > 200) & (F.col("k") <= 300)) \
        .withColumn("cents", F.lit(-1).cast("long"))
    try:
        S.snapshot_merge(spark, table_dir, bad_upd, "k",
                         base_version=stale)
        raise RuntimeError(
            "snapshot_metadata_conflict_parity: a merge whose rows "
            "violate the interleaved constraint PUBLISHED — the "
            "inherited contract was not re-validated")
    except ValueError as exc:
        if "nonneg" not in str(exc):
            raise
    if S.snapshot_current_version(table_dir) != v_add:
        raise RuntimeError(
            "snapshot_metadata_conflict_parity: the aborted merge "
            "still advanced the version")

    # (b) clean rewrite rebases THROUGH the metadata-only add
    upd = base.filter((F.col("k") > 100) & (F.col("k") <= 300)) \
        .withColumn("cents", F.col("cents") * 2)
    v_merge, _ = S.snapshot_merge(spark, table_dir, upd, "k",
                                  base_version=stale)
    if v_merge != v_add + 1:
        raise RuntimeError(
            "snapshot_metadata_conflict_parity: the clean rebase "
            f"published {v_merge}, expected {v_add + 1}")
    if S._read_manifest_meta(table_dir, v_merge)["constraints"] != \
            {"nonneg": "cents >= 0"}:
        raise RuntimeError(
            "snapshot_metadata_conflict_parity: the rebased merge "
            "dropped the interleaved constraint from the manifest")

    # (c) a constraint landing INSIDE an append's write->publish
    # window: the publish loop must re-validate the written files
    real_enf = S._enforce_constraints
    state = {"fired": False}

    def inject(spark_, td, c, entries, sj, verb):
        real_enf(spark_, td, c, entries, sj, verb)
        if not state["fired"] and td == table_dir:
            state["fired"] = True
            S.snapshot_add_constraint(spark_, td, "cap_k", "k <= 940")

    stray = inline_dim(spark, [(950, "1-URGENT", 10)],
                       "k long, pri string, cents long")
    head_before = S.snapshot_current_version(table_dir)
    try:
        S._enforce_constraints = inject
        S.snapshot_commit(spark, table_dir, stray.coalesce(1),
                          mode="append")
        raise RuntimeError(
            "snapshot_metadata_conflict_parity: an append violating "
            "the mid-flight constraint PUBLISHED")
    except ValueError as exc:
        if "cap_k" not in str(exc):
            raise
    finally:
        S._enforce_constraints = real_enf
    if not state["fired"]:
        raise RuntimeError(
            "snapshot_metadata_conflict_parity: the mid-flight "
            "injection never fired — the leg tested nothing")
    if S.snapshot_current_version(table_dir) != head_before + 1:
        raise RuntimeError(
            "snapshot_metadata_conflict_parity: expected exactly the "
            "constraint add to land during the aborted append")
    if S.snapshot_read(spark, table_dir).filter("k = 950").count():
        raise RuntimeError(
            "snapshot_metadata_conflict_parity: the aborted append's "
            "rows are readable")

    # (d) rebase through a manifest re-chunk
    third = base.filter((F.col("k") > 800) & (F.col("k") <= 900))
    for i in range(3):
        S.snapshot_commit(spark, table_dir,
                          third.filter(F.col("k") % 3 == i).coalesce(1),
                          mode="append")
    stale2 = S.snapshot_current_version(table_dir)
    vc = S.snapshot_compact_manifests(table_dir)
    if vc == stale2:
        raise RuntimeError(
            "snapshot_metadata_conflict_parity: manifest compaction "
            "no-op'ed — the fixture has nothing to re-chunk")
    upd2 = base.filter((F.col("k") > 300) & (F.col("k") <= 500)) \
        .withColumn("cents", F.col("cents") * 3)
    S.snapshot_merge(spark, table_dir, upd2, "k", base_version=stale2)
    return S.snapshot_read(spark, table_dir)


# ---------------------------------------------------------------------------
# Equality deletes: O(keys) CDC-trickle deletes (r13, VERDICT r12 item 2).
# ---------------------------------------------------------------------------
@query(
    "snapshot_equality_delete_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 1200
    ),
    final AS (
        SELECT k, pri, cents FROM base WHERE k <= 300 OR k > 500
        UNION ALL SELECT 350, 'REINSERT', 1
    )
    SELECT 'head' AS section, k, pri, cents FROM final
    UNION ALL
    SELECT 'deleted', k, pri, cents FROM base
    WHERE k > 300 AND k <= 500
    UNION ALL
    SELECT 'base', k, pri, cents FROM base
    """,
)
def snapshot_equality_delete_parity(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """EQUALITY DELETES (operators/snapshots.py:snapshot_delete_keys;
    VERDICT r12 item 2: snapshot_delete_where resolves row positions
    by READING the dirty band — O(band) per delete — so a trickle of
    keyed CDC deletes re-scans the band daily; Iceberg v2's
    equality-delete sidecar commits O(keys) with no data-file open).
    Two twin tables get the SAME logical delete (keys k in
    (300, 500]): one via snapshot_delete_keys, one via
    snapshot_delete_where. Pinned in-gate:

    (a) O(keys) commit: during snapshot_delete_keys the entry reader
        is TRIPWIRED — the verb may touch only its key sidecar, never
        a data file or entry list.
    (b) Read parity: head reads of the two twins are row-identical
        (both exceptAll directions), and both serve a key RE-INSERTED
        after the delete (sequence-number scoping).
    (c) CDF parity: the eq twin's LAZILY-computed D rows equal the
        position twin's recorded ones (hashed as ``deleted``).
    (d) OPTIMIZE materializes: after compaction the eq twin's
        manifest carries zero descriptors and the data still reads
        post-delete. ``base`` is pre-delete time travel."""
    from ..operators import snapshots as S

    eq_dir = _scratch(sf_dir, "snapshot_eq_delete")
    pos_dir = _scratch(sf_dir, "snapshot_eq_delete_twin")
    # tiny predicate band: the fact rebalance exchange is pure overhead
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    base = orders.filter(F.col("o_orderkey") <= 1200).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    for d in (eq_dir, pos_dir):
        S.snapshot_commit(spark, d,
                          base.filter(F.col("k") <= 600).coalesce(1))
        S.snapshot_commit(spark, d,
                          base.filter(F.col("k") > 600).coalesce(1),
                          mode="append")
    base_version = S.snapshot_current_version(eq_dir)

    # (a) the eq delete commits without opening any data file
    keys = base.filter((F.col("k") > 300) & (F.col("k") <= 500)) \
        .select("k")
    real = S._read_entries

    def tripwire(*a, **kw):
        raise RuntimeError(
            "snapshot_equality_delete_parity: snapshot_delete_keys "
            "read table entries — the commit must be O(keys)")

    try:
        S._read_entries = tripwire
        v_eq, info = S.snapshot_delete_keys(spark, eq_dir, keys, "k")
    finally:
        S._read_entries = real
    if info["keys"] == 0:
        raise RuntimeError(
            "snapshot_equality_delete_parity: empty key set — fixture "
            "degenerate")
    S.snapshot_delete_where(spark, pos_dir,
                            [("k", ">", 300), ("k", "<=", 500)],
                            key="k")

    # re-insert one deleted key AFTER both deletes
    re_row = inline_dim(spark, [(350, "REINSERT", 1)],
                        "k long, pri string, cents long")
    for d in (eq_dir, pos_dir):
        S.snapshot_commit(spark, d, re_row.coalesce(1), mode="append")

    # (b) twin parity, both directions
    eq_head = S.snapshot_read(spark, eq_dir)
    pos_head = S.snapshot_read(spark, pos_dir)
    if frames_differ(eq_head, pos_head):
        raise RuntimeError(
            "snapshot_equality_delete_parity: the equality-delete twin "
            "diverged from the position-delete twin")
    if eq_head.filter("k = 350 AND pri = 'REINSERT'").count() != 1:
        raise RuntimeError(
            "snapshot_equality_delete_parity: the post-delete "
            "re-insert did not survive — sequence scoping is broken")

    # (c) lazy CDF D rows == the position twin's recorded ones
    eq_feed = S.snapshot_read_cdf(spark, eq_dir, base_version,
                                  to_version=v_eq)
    if eq_feed.filter(F.col("_change_type") != "D").count():
        raise RuntimeError(
            "snapshot_equality_delete_parity: the eq delete's feed "
            "served non-D rows")
    deleted = eq_feed.select("k", "pri", "cents")

    # (d) OPTIMIZE materializes the sidecars away
    v_c, _, _ = S.snapshot_compact(spark, eq_dir, target_files=2)
    if S._read_manifest_meta(eq_dir, v_c)["eq_deletes"]:
        raise RuntimeError(
            "snapshot_equality_delete_parity: compaction carried "
            "equality-delete descriptors instead of materializing")
    final = S.snapshot_read(spark, eq_dir)
    if frames_differ(final, eq_head):
        raise RuntimeError(
            "snapshot_equality_delete_parity: compaction changed the "
            "table contents")

    def sec(df: DataFrame, s: str) -> DataFrame:
        return df.select(F.lit(s).alias("section"), "k", "pri", "cents")

    return (sec(final, "head")
            .unionByName(sec(deleted, "deleted"))
            .unionByName(sec(S.snapshot_read(spark, eq_dir,
                                             version=base_version),
                             "base")))


# ---------------------------------------------------------------------------
# Write-audit-publish: branches + tags (r13, VERDICT r12 item 5).
# ---------------------------------------------------------------------------
@query(
    "snapshot_wap_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 1300
    )
    SELECT 'head' AS section, k, pri, cents FROM base WHERE k <= 1000
    UNION ALL
    SELECT 'delta', k, pri, cents FROM base
    WHERE k > 800 AND k <= 1000
    UNION ALL
    SELECT 'base', k, pri, cents FROM base WHERE k <= 800
    UNION ALL
    SELECT 'pick', k, pri, cents FROM base
    """,
)
def snapshot_wap_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH (operators/snapshots.py
    :snapshot_create_branch / snapshot_fast_forward /
    snapshot_create_tag; VERDICT r12 item 5 — the last headline
    Iceberg workflow without a counterpart): stage a commit on a
    BRANCH (a private version chain over symlinked shared storage),
    audit it, and publish by fast-forwarding main. Pinned in-gate:

    (a) INVISIBILITY: the branch commit changes nothing main readers
        see (count and version pinned), while the branch reads the
        staged state.
    (b) FAILED AUDIT: a branch staging corrupted rows (negative
        cents) is detected by the audit filter and DROPPED — main
        untouched, no version burned.
    (c) PUBLISH: the audited branch fast-forwards as ONE ordinary
        APPEND — final state hash-matches the direct-commit twin
        (``head``), and the CDF across the publish is exactly the
        branch's rows as I (``delta``).
    (d) TAG: the pre-publish version is tagged and read back by name
        after an aggressive expire (``base`` — the retention pin).
    (e) CHERRY-PICK (r13 second half): a branch staged while main
        MOVES past the fork — an interleaved append AND an equality
        delete of exactly the branch's key range — refuses the strict
        fast-forward but lands via ``snapshot_cherry_pick`` as one
        append whose re-stamped rows SURVIVE the interleaved delete
        (serial order: the pick publishes after it), with the pick's
        CDF serving the branch rows as I (``pick``)."""
    from ..operators import snapshots as S

    table_dir = _scratch(sf_dir, "snapshot_wap")
    twin_dir = _scratch(sf_dir, "snapshot_wap_twin")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    wide = orders.filter(F.col("o_orderkey") <= 1300).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = orders.filter(F.col("o_orderkey") <= 1000).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    main_part = base.filter(F.col("k") <= 800)
    delta_part = base.filter(F.col("k") > 800)
    for d in (table_dir, twin_dir):
        S.snapshot_commit(spark, d,
                          main_part.filter(F.col("k") <= 400)
                          .coalesce(1))
        S.snapshot_commit(spark, d,
                          main_part.filter(F.col("k") > 400)
                          .coalesce(1), mode="append")
    fork_v = S.snapshot_current_version(table_dir)
    S.snapshot_create_tag(table_dir, "pre_publish", version=fork_v)

    # (b) failed audit: corrupted staging never reaches main
    bad_dir = S.snapshot_create_branch(table_dir, "bad")
    S.snapshot_commit(
        spark, bad_dir,
        delta_part.withColumn("cents", -F.col("cents")).coalesce(1),
        mode="append")
    bad_rows = S.snapshot_read(spark, bad_dir) \
        .filter(F.col("cents") < 0).count()
    if bad_rows == 0:
        raise RuntimeError(
            "snapshot_wap_parity: the audit found nothing to fail on")
    S.snapshot_drop_branch(table_dir, "bad")
    if (S.snapshot_current_version(table_dir) != fork_v
            or S.snapshot_read(spark, table_dir).count()
            != main_part.count()):
        raise RuntimeError(
            "snapshot_wap_parity: the failed audit leaked into main")

    # (a)+(c) clean branch: stage, audit, publish
    bdir = S.snapshot_create_branch(table_dir, "audit")
    S.snapshot_commit(spark, bdir, delta_part.coalesce(1),
                      mode="append")
    if S.snapshot_current_version(table_dir) != fork_v:
        raise RuntimeError(
            "snapshot_wap_parity: the branch commit advanced main")
    if S.snapshot_read(spark, bdir).count() != base.count():
        raise RuntimeError(
            "snapshot_wap_parity: the branch does not read its own "
            "staged state")
    if S.snapshot_read(spark, bdir) \
            .filter(F.col("cents") < 0).count():
        raise RuntimeError("snapshot_wap_parity: audit failed")
    v_pub = S.snapshot_fast_forward(table_dir, "audit")
    if S._read_manifest_meta(table_dir, v_pub)["mode"] != "append":
        raise RuntimeError(
            "snapshot_wap_parity: an append-only branch did not "
            "fast-forward as an append")

    # direct-commit twin parity
    S.snapshot_commit(spark, twin_dir, delta_part.coalesce(1),
                      mode="append")
    main_head = S.snapshot_read(spark, table_dir)
    twin_head = S.snapshot_read(spark, twin_dir)
    if frames_differ(main_head, twin_head):
        raise RuntimeError(
            "snapshot_wap_parity: the fast-forwarded state diverged "
            "from the direct-commit twin")
    feed = S.snapshot_read_cdf(spark, table_dir, fork_v)
    if feed.filter(F.col("_change_type") != "I").count():
        raise RuntimeError(
            "snapshot_wap_parity: the publish CDF served non-I rows")

    # (d) the tag survives an aggressive expire
    S.snapshot_expire(table_dir, keep_last=1, tmp_grace_seconds=0)
    tagged = S.snapshot_read(
        spark, table_dir,
        version=S.snapshot_tag_version(table_dir, "pre_publish"))

    # (e) cherry-pick onto a moved main: branch stages (1000, 1200];
    # main interleaves an append of (1200, 1300] AND an equality
    # delete of keys (1000, 1100] — currently matching nothing, but
    # exactly the picked range (a mis-scoped pick would lose them)
    late = wide.filter(F.col("k") > 1000) \
        .filter(F.col("k") <= 1200)
    pdir = S.snapshot_create_branch(table_dir, "late")
    S.snapshot_commit(spark, pdir, late.coalesce(1), mode="append")
    S.snapshot_commit(spark, table_dir,
                      wide.filter(F.col("k") > 1200).coalesce(1),
                      mode="append")
    S.snapshot_delete_keys(
        spark, table_dir,
        late.filter(F.col("k") <= 1100).select("k"), "k")
    head_before_pick = S.snapshot_current_version(table_dir)
    try:
        S.snapshot_fast_forward(table_dir, "late")
        raise RuntimeError(
            "snapshot_wap_parity: a moved main accepted the strict "
            "fast-forward")
    except S.SnapshotConflictError:
        pass
    v_pick = S.snapshot_cherry_pick(spark, table_dir, "late")
    S.snapshot_drop_branch(table_dir, "late")
    if S._read_manifest_meta(table_dir, v_pick)["mode"] != "append":
        raise RuntimeError(
            "snapshot_wap_parity: the cherry-pick did not publish as "
            "an append")
    pick_feed = S.snapshot_read_cdf(spark, table_dir, head_before_pick)
    if (pick_feed.filter(F.col("_change_type") != "I").count()
            or pick_feed.count() != late.count()):
        raise RuntimeError(
            "snapshot_wap_parity: the pick CDF is not exactly the "
            "branch rows as I")
    pick_head = S.snapshot_read(spark, table_dir)
    survivors = pick_head.filter(
        (F.col("k") > 1000) & (F.col("k") <= 1100)).count()
    if survivors != late.filter(F.col("k") <= 1100).count():
        raise RuntimeError(
            "snapshot_wap_parity: the interleaved equality delete ate "
            "the cherry-picked rows — sequence re-stamping is broken")

    def sec(df: DataFrame, s: str) -> DataFrame:
        return df.select(F.lit(s).alias("section"), "k", "pri", "cents")

    return (sec(main_head, "head")
            .unionByName(sec(feed.select("k", "pri", "cents"), "delta"))
            .unionByName(sec(tagged, "base"))
            .unionByName(sec(pick_head, "pick")))


# ---------------------------------------------------------------------------
# Metadata tables through the SQL surface (r13 second half).
# ---------------------------------------------------------------------------
@query(
    "snapshot_metadata_tables_parity",
    oracle="""
    WITH c AS (SELECT
      (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 500) AS c0,
      (SELECT COUNT(*) FROM orders
       WHERE o_orderkey > 500 AND o_orderkey <= 1000) AS c1,
      (SELECT COUNT(*) FROM orders
       WHERE o_orderkey > 1000 AND o_orderkey <= 1200) AS c2,
      (SELECT COUNT(*) FROM orders
       WHERE o_orderkey > 200 AND o_orderkey <= 300) AS k)
    SELECT 'history' AS section, CAST(0 AS BIGINT) AS v,
           'append' AS mode, CAST(1 AS BIGINT) AS a,
           CAST(c0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS c FROM c
    UNION ALL SELECT 'history', 1, 'append', 2, c0 + c1, 0 FROM c
    UNION ALL SELECT 'history', 2, 'rewrite', 2, c0 + c1, k FROM c
    UNION ALL SELECT 'history', 3, 'append', 3, c0 + c1 + c2, k FROM c
    UNION ALL SELECT 'files', 0, NULL, 1, CAST(c0 AS BIGINT), NULL FROM c
    UNION ALL SELECT 'files', 1, NULL, 0, CAST(c1 AS BIGINT), NULL FROM c
    UNION ALL SELECT 'files', 3, NULL, 0, CAST(c2 AS BIGINT), NULL FROM c
    """,
)
def snapshot_metadata_tables_parity(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """METADATA TABLES through pure SQL (r13 second half —
    sources/snapshot_source.py:SnapshotMetadataReader; Iceberg's
    ``history``/``files`` metadata tables): ``CREATE TEMPORARY VIEW …
    USING snapshot_table OPTIONS (path '…', metadata 'history')``.
    Lifecycle: two appends, an equality delete of keys (200, 300]
    (O(keys) — no change log, physical counts unchanged), a third
    append. Pinned in-gate: the SQL ``history`` view row-matches the
    ``snapshot_history`` operator exactly; the ``files`` view is
    manifest-truth — one row per live file with its sequence number,
    footer row count, and the number of equality-delete descriptors
    STILL APPLICABLE to it (seq- AND key-band-scoped: the delete's
    recorded key band [201..300] provably cannot touch the second
    file, and the third append is NEWER than the delete, so only the
    first file counts 1); ``files`` time travel (version '0') plans
    one file; ``metadata`` composed with ``cdf`` refuses. The hash
    gates both sections against the oracle's direct reconstruction
    from orders counts."""
    from ..operators import snapshots as S
    from ..sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    table_dir = _scratch(sf_dir, "snapshot_metadata_tables")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    base = orders.filter(F.col("o_orderkey") <= 1200).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    S.snapshot_commit(spark, table_dir,
                      base.filter(F.col("k") <= 500).coalesce(1),
                      mode="append")                               # v0
    S.snapshot_commit(
        spark, table_dir,
        base.filter((F.col("k") > 500) & (F.col("k") <= 1000))
        .coalesce(1), mode="append")                               # v1
    S.snapshot_delete_keys(
        spark, table_dir,
        base.filter((F.col("k") > 200) & (F.col("k") <= 300))
        .select("k"), "k")                                         # v2
    S.snapshot_commit(spark, table_dir,
                      base.filter(F.col("k") > 1000).coalesce(1),
                      mode="append")                               # v3

    hist_view = f"meta_hist_{abs(hash(table_dir)) % 10 ** 8}"
    files_view = f"meta_files_{abs(hash(table_dir)) % 10 ** 8}"
    spark.sql(f"DROP VIEW IF EXISTS {hist_view}")
    spark.sql(f"DROP VIEW IF EXISTS {files_view}")
    spark.sql(
        f"CREATE TEMPORARY VIEW {hist_view} USING snapshot_table "
        f"OPTIONS (path '{table_dir}', metadata 'history')")
    spark.sql(
        f"CREATE TEMPORARY VIEW {files_view} USING snapshot_table "
        f"OPTIONS (path '{table_dir}', metadata 'files')")

    # the SQL surface must agree with the operator row-for-row
    op_rows = sorted(tuple(r) for r in
                     S.snapshot_history(spark, table_dir).collect())
    sql_rows = sorted(tuple(r) for r in
                      spark.table(hist_view).collect())
    if op_rows != sql_rows:
        raise RuntimeError(
            "snapshot_metadata_tables_parity: the SQL history view "
            "diverged from the snapshot_history operator")
    # files time travel plans exactly the v0 manifest
    v0_files = (spark.read.format("snapshot_table")
                .option("version", "0").option("metadata", "files")
                .load(table_dir).count())
    if v0_files != 1:
        raise RuntimeError(
            f"snapshot_metadata_tables_parity: version-0 files "
            f"metadata has {v0_files} rows, expected 1")
    # metadata has no change feed
    try:
        (spark.read.format("snapshot_table").option("cdf", "true")
         .option("metadata", "files").load(table_dir).count())
        raise RuntimeError(
            "snapshot_metadata_tables_parity: metadata+cdf did not "
            "refuse")
    except Exception as exc:
        if "metadata" not in str(exc):
            raise

    hist = spark.table(hist_view).select(
        F.lit("history").alias("section"),
        F.col("version").alias("v"),
        "mode",
        F.col("n_files").alias("a"),
        F.col("n_rows").alias("b"),
        F.col("n_pending_delete_keys").alias("c"),
    )
    files = spark.table(files_view).select(
        F.lit("files").alias("section"),
        F.col("seq").alias("v"),
        F.lit(None).cast("string").alias("mode"),
        F.col("n_eq_deletes_applicable").alias("a"),
        F.col("n_rows").alias("b"),
        F.lit(None).cast("long").alias("c"),
    )
    return hist.unionByName(files)


@query(
    "snapshot_upsert_keys_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 1200
    )
    SELECT k, pri, cents FROM base WHERE k <= 300
    UNION ALL
    SELECT k, pri, cents * 2 + 1 FROM base
    WHERE k > 300 AND k <= 600
    UNION ALL
    SELECT k, pri, cents * 3 + 2 FROM base WHERE k > 600
    """,
)
def snapshot_upsert_keys_parity(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """MERGE-ON-READ UPSERT (operators/snapshots.py
    :snapshot_upsert_keys; r13 second half — Iceberg v2's streaming
    CDC upsert): one commit = new rows + an equality-delete descriptor
    for exactly their keys, O(new) with ZERO existing data files
    opened, where the copy-on-write twin re-reads the dirty band per
    batch. Two chained upserts land on a two-file base — the first
    updates (300, 600] (cents*2+1), the second OVERLAPS it and
    inserts: (600, 1200] at cents*3+2 of the ORIGINAL cents, so
    latest-wins layering across three generations is what the hash
    gates. Pinned in-gate: (a) both upsert commits are tripwired
    against any table-entry read; (b) head parity with the
    copy-on-write snapshot_apply_cdc twin, both exceptAll directions;
    (c) the batch CDF serves each upsert version as exactly its delta
    rows, all 'U'; (d) replaying the full feed from version 0
    reproduces the head. The oracle restates the final layering
    directly from orders."""
    from ..operators import snapshots as S
    from ..operators.merge import apply_cdc

    table_dir = _scratch(sf_dir, "snapshot_upsert_keys")
    twin_dir = _scratch(sf_dir, "snapshot_upsert_keys_twin")
    orders = load_table(spark, sf_dir, "orders", rebalance=False)
    wide = orders.filter(F.col("o_orderkey") <= 1200).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = wide.filter(F.col("k") <= 1000)
    up1 = wide.filter((F.col("k") > 300) & (F.col("k") <= 600)) \
        .withColumn("cents", F.col("cents") * 2 + 1)
    up2 = wide.filter(F.col("k") > 600) \
        .withColumn("cents", F.col("cents") * 3 + 2)
    for d in (table_dir, twin_dir):
        S.snapshot_commit(spark, d,
                          base.filter(F.col("k") <= 500).coalesce(1),
                          mode="append")
        S.snapshot_commit(spark, d,
                          base.filter(F.col("k") > 500).coalesce(1),
                          mode="append")

    real = S._read_entries

    def tripwire(*a, **kw):
        raise RuntimeError(
            "snapshot_upsert_keys_parity: the upsert read table "
            "entries — the commit must be O(new), zero band reads")

    try:
        S._read_entries = tripwire
        v1, info1 = S.snapshot_upsert_keys(spark, table_dir, up1, "k")
        v2, info2 = S.snapshot_upsert_keys(spark, table_dir, up2, "k")
    finally:
        S._read_entries = real
    if info1["rows"] != up1.count() or info2["rows"] != up2.count():
        raise RuntimeError(
            "snapshot_upsert_keys_parity: row accounting diverged")

    # (b) copy-on-write twin
    for up in (up1, up2):
        S.snapshot_apply_cdc(
            spark, twin_dir,
            up.select("k", "pri", "cents", F.lit(1).alias("seq"),
                      F.lit("U").alias("op")), "k")
    head = S.snapshot_read(spark, table_dir)
    twin = S.snapshot_read(spark, twin_dir)
    if frames_differ(head, twin):
        raise RuntimeError(
            "snapshot_upsert_keys_parity: merge-on-read head diverged "
            "from the copy-on-write twin")

    # (c) each upsert version's feed = its delta as U
    for v, up in ((v1, up1), (v2, up2)):
        feed = S.snapshot_read_cdf(spark, table_dir, v - 1,
                                   to_version=v)
        n_u = feed.filter(F.col("_change_type") == "U").count()
        if feed.count() != up.count() or n_u != feed.count():
            raise RuntimeError(
                f"snapshot_upsert_keys_parity: version {v} feed is "
                "not exactly its delta as U rows")

    # (d) full-range replay from version 0 reproduces the head
    replayed = apply_cdc(
        S.snapshot_read(spark, table_dir, version=0),
        S.snapshot_read_cdf(spark, table_dir, 0, to_version=v2)
        .select("k", "pri", "cents",
                F.col("_commit_version").alias("seq"),
                F.when(F.col("_change_type") == "D", F.lit("D"))
                .otherwise(F.lit("U")).alias("op")),
        "k").drop("cdc_action")
    if frames_differ(replayed, head):
        raise RuntimeError(
            "snapshot_upsert_keys_parity: replaying the feed did not "
            "reproduce the head")
    return head
