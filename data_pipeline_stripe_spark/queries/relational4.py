"""Fourth batch: window frame bounds (first/last_value, cume_dist),
lateral posexplode, sequence-transition statistics, deterministic per-key
reservoir sampling, and a fixed-weight integer quality classifier.

These extend the declared surface past the reference's report queries
(reference top10.py / platform_usage.py / royalties.py) toward the
sequence/sampling operators a training-data pipeline runs at scale: a
Markov transition matrix over event streams, a per-key deterministic
sample, and a linear quality model — each one shuffle on its natural key
and exact in integer arithmetic so the DuckDB oracle is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources import load_table
from .registry import query


@query(
    "window_bounds_cume_dist",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER wd, 2) AS first_price,
           ROUND(LAST_VALUE(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING), 2) AS last_price,
           ROUND(CUME_DIST() OVER
                 (PARTITION BY o_custkey ORDER BY o_totalprice), 6) AS price_cd
    FROM orders
    WINDOW wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_bounds_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-bound window functions the earlier batches don't touch:
    first_value (default growing frame), last_value (explicit
    unbounded-following frame — the classic trap: the default frame makes
    last_value degenerate to the current row), and cume_dist (peer-aware
    tie handling, identical definition in Spark and DuckDB). Two sorts
    share ONE hash partitioning on o_custkey — a single exchange."""
    orders = load_table(spark, sf_dir, "orders")
    wd = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = wd.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wp = W.partitionBy("o_custkey").orderBy("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(wd), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
        F.round(F.cume_dist().over(wp), 6).alias("price_cd"),
    )


@query(
    "posexplode_doc_words",
    oracle="""
    SELECT doc_id, CAST(t.pos AS BIGINT) AS pos, words[t.pos + 1] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents WHERE doc_id % 10 = 0),
         UNNEST(range(len(words))) AS t(pos)
    """,
)
def posexplode_doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral position-preserving explode (generator expression): every
    word of every 10th document with its 0-based position — the
    tokenize-with-offsets primitive sequence labeling needs. Runs inside
    the scan stage (generators are codegen'd, no shuffle at all); the
    oracle's lateral UNNEST(range(len)) is the same lateral join."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "word")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH pairs AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ), agg AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type)
                AS BIGINT) AS p_micro
    FROM agg
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    (the sequence-statistics pass a behavioral-training pipeline runs
    before building next-event models): lead() pairs consecutive events
    per user, one grouped count, and the row-normalized probability in
    integer millionths (`div`) so cross-engine equality is exact. Shape:
    one exchange on user_id for the lead, one on (from, to) for the
    count — the transition matrix itself is tiny (|types|^2) so the
    normalizing window is broadcast-scale."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    agg = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    wn = W.partitionBy("from_type")
    return agg.select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000000 div sum(n) over (partition by from_type)")
        .cast("long")
        .alias("p_micro"),
    )


@query(
    "events_reservoir_per_user",
    oracle="""
    SELECT user_id, event_id, samp_rank FROM (
        SELECT user_id, event_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS BIGINT) AS samp_rank
        FROM events
    ) WHERE samp_rank <= 3
    """,
)
def events_reservoir_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-key reservoir sample: k=3 events per user,
    chosen by ranking on md5(event_id) — a seeded shuffle that is
    reproducible across engines, partitionings, and re-runs (true
    reservoir sampling is order-dependent; hashing the id gives the same
    uniform draw with none of the nondeterminism). One exchange on
    user_id; the rank+filter prunes to 3·|users| rows before anything
    downstream. 100 TB shape: this is how you cut a per-user eval slice
    out of a full event log without a global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.row_number().over(w).cast("long").alias("samp_rank"),
        )
        .filter(F.col("samp_rank") <= 3)
    )


@query(
    "events_value_outliers",
    oracle="""
    WITH q AS (
        SELECT event_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS s,
               SUM(CAST(ROUND(value * 100) AS BIGINT)
                   * CAST(ROUND(value * 100) AS BIGINT)) OVER w AS q2,
               COUNT(*) OVER w AS n
        FROM events
        WINDOW w AS (PARTITION BY event_type)
    )
    SELECT event_id, event_type, x AS value_cents
    FROM q
    WHERE (CAST(n AS HUGEINT) * x - CAST(s AS HUGEINT))
          * (CAST(n AS HUGEINT) * x - CAST(s AS HUGEINT))
          > 9 * (CAST(n AS HUGEINT) * CAST(q2 AS HUGEINT)
                 - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))
    """,
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 3σ outlier detection WITHOUT floats — the statistical
    quality gate a telemetry/training pipeline runs before aggregating:
    quantize values to integer cents, then flag x iff
    (n·x − S)² > 9·(n·Q − S²), which is algebra for |z| > 3 with
    z² = (x−μ)²/σ²_pop — every term an integer (S, Q, n are the group's
    sum, sum-of-squares, count), so the cut is bit-identical across
    engines and partitionings (a float mean/stddev pipeline flags
    borderline points differently per association order). The squares
    run in decimal(38,0) — exact to 1e38, i.e. to ~1e9 rows per group
    at cent precision. One exchange (the per-type window); group
    moments are two sums, trivially partial-aggregable at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    w = W.partitionBy("event_type")
    q = ev.select(
        "event_id", "event_type", x.alias("x"),
    ).select(
        "event_id", "event_type", "x",
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("q2"),
        F.count("*").over(w).alias("n"),
    )
    lhs = "cast(cast(n as decimal(38,0)) * x - s as decimal(38,0))"
    rhs = ("9 * (cast(n as decimal(38,0)) * cast(q2 as decimal(38,0))"
           " - cast(s as decimal(38,0)) * cast(s as decimal(38,0)))")
    return (
        q.filter(F.expr(f"{lhs} * {lhs} > {rhs}"))
        .select("event_id", "event_type", F.col("x").alias("value_cents"))
    )


@query(
    "full_outer_customer_event_users",
    oracle="""
    WITH ev AS (SELECT user_id, COUNT(*) AS n_ev FROM events GROUP BY 1)
    SELECT COALESCE(ev.user_id, c.c_custkey) AS ukey,
           ev.user_id IS NOT NULL AS has_events,
           c.c_custkey IS NOT NULL AS is_customer,
           CAST(COALESCE(ev.n_ev, 0) AS BIGINT) AS n_events,
           ROUND(c.c_acctbal, 2) AS acctbal
    FROM ev FULL OUTER JOIN customer c ON ev.user_id = c.c_custkey
    """,
)
def full_outer_customer_event_users(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """FULL OUTER join — the one join type the other declared queries
    don't exercise (left/semi/anti/expression/range/as-of are covered):
    event users vs the customer dimension, keeping unmatched rows from
    BOTH sides with presence flags — the reconciliation shape of an
    identity-stitching audit. Pre-aggregating events to one row per
    user before the join keeps the shuffled build side minimal; full
    outer forces a sort-merge (broadcast can't preserve the unmatched
    stream side), which is the correct plan at any scale."""
    ev = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").alias("n_ev")
    )
    cust = load_table(spark, sf_dir, "customer")
    j = ev.join(cust, ev.user_id == cust.c_custkey, "full_outer")
    return j.select(
        F.coalesce("user_id", "c_custkey").alias("ukey"),
        F.col("user_id").isNotNull().alias("has_events"),
        F.col("c_custkey").isNotNull().alias("is_customer"),
        F.coalesce("n_ev", F.lit(0)).cast("long").alias("n_events"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )


@query(
    "cdc_apply_order_status",
    oracle="""
    WITH changes AS (
        SELECT o_orderkey, o_custkey, 'U1' AS o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority, 1 AS seq, 'U' AS op
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority, 2 AS seq, 'D' AS op
        FROM orders WHERE o_orderkey % 14 = 0
    ), last AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                         ORDER BY seq DESC) AS rn
            FROM changes) WHERE rn = 1
    )
    SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderstatus
                ELSE b.o_orderstatus END AS o_orderstatus,
           ROUND(CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_totalprice
                      ELSE b.o_totalprice END, 2) AS totalprice,
           CASE WHEN c.o_orderkey IS NOT NULL THEN 'upserted'
                ELSE 'kept' END AS cdc_action
    FROM orders b FULL OUTER JOIN last c ON b.o_orderkey = c.o_orderkey
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
)
def cdc_apply_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY CHANGES with deletes (operators/merge.py:apply_cdc) —
    the ingest primitive merge_upsert can't express: a change stream
    with two generations (seq 1 upserts status 'U1' on every 7th order;
    seq 2 deletes every 14th) folds latest-wins per key, then applies
    to the base in ONE full-outer keyed join — every 14th order
    vanishes, every other 7th carries the upserted status, the rest
    pass through. The oracle replays latest-wins + apply in SQL rather
    than transcribing the expected output, so the semantics themselves
    are cross-checked. Scale: the window runs over the change BATCH
    only; the base is touched exactly once."""
    from ..operators.merge import apply_cdc

    orders = load_table(spark, sf_dir, "orders")
    c1 = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderstatus", F.lit("U1"))
        .withColumn("seq", F.lit(1))
        .withColumn("op", F.lit("U"))
    )
    c2 = (
        orders.filter(F.col("o_orderkey") % 14 == 0)
        .withColumn("seq", F.lit(2))
        .withColumn("op", F.lit("D"))
    )
    final = apply_cdc(orders, c1.unionByName(c2), "o_orderkey")
    return final.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("totalprice"),
        "cdc_action",
    )


@query(
    "cohort_retention_matrix",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY 1
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day_s,
           CAST(day_offset AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM activity
    WHERE day_offset <= 14
    GROUP BY cohort_day, day_offset
    """,
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (the D0/D1/…/D14 matrix): each user joins the
    cohort of their FIRST event day; the cell (cohort, offset) counts
    users active exactly `offset` days later. Two exchanges — one
    groupBy(user) for first-day (an agg, not a window: the per-user min
    combines map-side), then the distinct+count on (cohort, offset).
    The user-keyed join of activity back to cohorts co-partitions with
    the first agg, so at 100 TB the whole thing is two shuffles of
    (user, date) pairs, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .join(firsts, "user_id")
        .select(
            "user_id", "cohort_day",
            F.datediff("d", "cohort_day").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 14)
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_users")
    ).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day_s"),
        F.col("day_offset").cast("long").alias("day_offset"),
        "n_users",
    )


@query(
    "abc_parts_by_brand_revenue",
    oracle="""
    WITH rev AS (
        SELECT p.p_brand, l.l_partkey,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT p_brand, l_partkey, rev_cents,
               SUM(rev_cents) OVER (PARTITION BY p_brand
                   ORDER BY rev_cents DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cents,
               SUM(rev_cents) OVER (PARTITION BY p_brand) AS tot_cents
        FROM rev
    )
    SELECT p_brand, l_partkey, rev_cents,
           CASE WHEN cum_cents * 100 <= tot_cents * 80 THEN 'A'
                WHEN cum_cents * 100 <= tot_cents * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def abc_parts_by_brand_revenue(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """ABC / Pareto classification per brand: rank each brand's parts by
    revenue, then class A = parts inside the first 80% of cumulative
    revenue, B to 95%, C the tail — the inventory-analytics operator
    behind keep-the-head curation cuts. Revenue is integer cents and
    the thresholds are cross-multiplied (cum·100 ≤ tot·80), so the
    class boundary needs NO division and is bit-identical across
    engines. One shuffle for the (brand, part) agg, one partitioning
    on brand shared by BOTH windows (running + total); per-brand group
    state keeps the global-sort trap out — a single global ABC would
    need the two-phase prefix sum (operators/packing.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(pt.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum(
            F.round(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")) * 100).cast("long")
        ).alias("rev_cents"))
    )
    wrun = (
        W.partitionBy("p_brand")
        .orderBy(F.col("rev_cents").desc(), "l_partkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wtot = W.partitionBy("p_brand")
    ranked = rev.select(
        "p_brand", "l_partkey", "rev_cents",
        F.sum("rev_cents").over(wrun).alias("cum_cents"),
        F.sum("rev_cents").over(wtot).alias("tot_cents"),
    )
    return ranked.select(
        "p_brand", "l_partkey", "rev_cents",
        F.when(F.col("cum_cents") * 100 <= F.col("tot_cents") * 80, "A")
        .when(F.col("cum_cents") * 100 <= F.col("tot_cents") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "orders_nested_lines_export",
    oracle="""
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           string_agg(
               l_linenumber || ':' || l_partkey || ':'
               || CAST(CAST(ROUND(l_quantity * 100) AS BIGINT) AS VARCHAR),
               '|' ORDER BY l_linenumber || ':' || l_partkey || ':'
               || CAST(CAST(ROUND(l_quantity * 100) AS BIGINT) AS VARCHAR))
               AS lines_export
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def orders_nested_lines_export(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Denormalize-to-nested export: collapse each order's line items
    into ONE deterministic string (sorted 'line:part:qty_cents' fields)
    — the shape of a document/JSON export feed, rendered as a canonical
    string so two engines can hash-compare it (raw to_json differs in
    key order and float formatting across engines; a sorted canonical
    join does not). One shuffle on the order key; collect_list is safe
    because group size is the per-order line count (≤7 in TPC-H shape),
    bounded by the schema, not the data volume."""
    li = load_table(spark, sf_dir, "lineitem")
    s = F.concat_ws(
        ":",
        F.col("l_linenumber"),
        F.col("l_partkey"),
        F.round(F.col("l_quantity") * 100).cast("long"),
    )
    return (
        li.select("l_orderkey", s.alias("s"))
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.array_join(F.array_sort(F.collect_list("s")), "|")
            .alias("lines_export"),
        )
    )


@query(
    "events_sliding_hourly_counts",
    oracle="""
    SELECT strftime(make_timestamp(
               ((epoch_ms(ts) // 900000) - t.i) * 900000 * 1000),
               '%Y-%m-%d %H:%M:%S') AS win_start_s,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events, UNNEST(range(4)) AS t(i)
    GROUP BY 1, 2
    """,
)
def events_sliding_hourly_counts(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """SLIDING window aggregation in batch (1 h window, 15 min slide):
    F.window's generator replicates each event into window/slide = 4
    overlapping buckets, then one grouped count per (window, type) —
    the moving-rate surface behind alerting dashboards, and the batch
    twin of a sliding streaming aggregation. The oracle derives the
    same 4 window starts arithmetically (floor-to-slide minus i slides;
    every event lands in exactly window/slide slide-aligned windows).
    Scale: replication happens scan-side (a Generate, no shuffle), the
    count combines map-side, and output cardinality is bounded by
    (time-range/slide)·|types|, not by event volume."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss")
            .alias("win_start_s"),
            "event_type",
            "n_events",
        )
    )
