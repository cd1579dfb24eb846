"""Relational operator queries (SURVEY.md §2.3–§2.9) over the driver tables.

Each query exercises one or more operators from the reference's inventory,
re-expressed idiomatically: broadcast joins for dims, window functions
instead of aggregate-then-self-join, single-pass plans. Oracle twins are
DuckDB SQL; every computed column is aliased identically on both sides and
doubles are rounded on both sides so value hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources import load_table
from ._grid import grid_sum
from .registry import query


# ---------------------------------------------------------------------------
# A2-family: multi-aggregate grouped scan (TPC-H Q1 shape).
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0, 2)
               AS sum_qty,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
               AS sum_base_price,
           ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) / 10000.0, 2)                 AS sum_disc_price,
           ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                * 1000000) AS BIGINT)) / 1000000.0, 2)
               AS sum_charge,
           ROUND(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0
                 / COUNT(*), 4)                                AS avg_qty,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
                 / COUNT(*), 4)                                AS avg_price,
           ROUND(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) / 100.0
                 / COUNT(*), 4)                                AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                            AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate scan — the A2 pattern (reference
    platform_usage.py:118-181) generalized to 8 aggregates in ONE pass.
    Filter + pruned columns push down to the parquet scan; partial
    aggregation happens map-side before the single shuffle.

    Every sum/avg is an exact decimal-grid BIGINT sum (queries/_grid.py):
    quantity and price live on the cent grid, price×(1−disc) on 1e-4,
    ×(1+tax) on 1e-6 — so the aggregates are associative under any
    partitioning and the single trailing division matches DuckDB's."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cnt = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(grid_sum(F.col("l_quantity"), 100), 2).alias("sum_qty"),
            F.round(grid_sum(F.col("l_extendedprice"), 100), 2).alias("sum_base_price"),
            F.round(grid_sum(disc_price, 10000), 2).alias("sum_disc_price"),
            F.round(grid_sum(disc_price * (1 + F.col("l_tax")), 1000000), 2).alias("sum_charge"),
            F.round(grid_sum(F.col("l_quantity"), 100) / cnt, 4).alias("avg_qty"),
            F.round(grid_sum(F.col("l_extendedprice"), 100) / cnt, 4).alias("avg_price"),
            F.round(grid_sum(F.col("l_discount"), 100) / cnt, 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J1+J2 (broadcast dim joins) + A1 (count) — star join.
# ---------------------------------------------------------------------------
@query(
    "star_join_revenue_by_region",
    oracle="""
    SELECT r.r_name AS region_name,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)) / 10000.0, 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation  n ON s.s_nationkey = n.n_nationkey
    JOIN region  r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def star_join_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ chained small dims (reference J1/J2: top10.py:227-236) with
    explicit broadcast of every dim — no shuffle of the fact for the joins,
    only for the final small aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    reg = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.round(
                grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Left-outer join with missing keys (J1 null path, FIXTURES.md events).
# ---------------------------------------------------------------------------
@query(
    "left_join_missing_dim",
    oracle="""
    SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(c.c_custkey) AS BIGINT) AS n_matched
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY COALESCE(c.c_mktsegment, 'UNKNOWN')
    """,
)
def left_join_missing_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi left-outer join preserving unmatched fact rows (reference
    J1, top10.py:227-230: events ⟕ resources keeps events whose
    resourceId has no resource). Dim side broadcast."""
    ev = load_table(spark, sf_dir, "events")
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    return (
        ev.join(cust, ev.user_id == cust.c_custkey, "left")
        .groupBy(F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"))
        .agg(
            F.count("*").alias("n_events"),
            F.count("c_custkey").alias("n_matched"),
        )
    )


# ---------------------------------------------------------------------------
# J8: expression join with differing column names.
# ---------------------------------------------------------------------------
@query(
    "expression_join_nation_region",
    oracle="""
    SELECT n.n_name AS nation_name, r.r_name AS region_name,
           CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers,
           ROUND(SUM(CAST(ROUND(COALESCE(c.c_acctbal, 0) * 100) AS BIGINT))
                 / 100.0, 2) AS total_acctbal
    FROM nation n
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, r.r_name
    """,
)
def expression_join_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression join on differently-named keys (reference J8,
    royalties.py:298: joined.countryCode == countries.CountryCode)."""
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    return (
        nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey, "left")
        .join(cust, cust.c_nationkey == nat.n_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation_name"), F.col("r_name").alias("region_name"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(
                grid_sum(F.coalesce(F.col("c_acctbal"), F.lit(0.0)), 100), 2
            ).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (engine completeness beyond reference's left-only set).
# ---------------------------------------------------------------------------
@query(
    "semi_join_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS. Not used by the reference (its P7 RDD
    null-filter after left join *emulates* inner/semi, royalties.py:306);
    declared explicitly here."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS. Restricted to orders since 1999 so
    the result is non-empty at every SF (every customer has SOME order
    in this data; a 0-row vs 0-row compare gates nothing)."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# W1: top-K per group via dense_rank (ties kept) — the top10 spine.
# ---------------------------------------------------------------------------
@query(
    "topk_parts_per_brand",
    oracle="""
    WITH counts AS (
        SELECT p.p_brand AS brand, l.l_partkey AS part_key,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, l.l_partkey
    ), ranked AS (
        SELECT brand, part_key, cnt,
               CAST(DENSE_RANK() OVER (PARTITION BY brand ORDER BY cnt DESC) AS BIGINT) AS position
        FROM counts
    )
    SELECT brand, part_key, cnt, position FROM ranked WHERE position <= 5
    """,
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group with dense_rank and ties KEPT — the reference's W1
    semantic (top10.py:247-251: a "top 10" may exceed 10 rows on ties).
    One shuffle for the count, one for the window."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    counts = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_partkey").alias("part_key"))
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("brand").orderBy(F.col("cnt").desc())
    return (
        counts.withColumn("position", F.dense_rank().over(w).cast("long"))
        .filter(F.col("position") <= 5)
        .select("brand", "part_key", "cnt", "position")
    )


# ---------------------------------------------------------------------------
# Window running sum (frame-bounded) — extends reference's default-frame-only
# window usage.
# ---------------------------------------------------------------------------
@query(
    "running_order_total_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2)
               AS running_total
    FROM orders
    """,
)
def running_order_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum over an explicit ROWS frame with a deterministic
    ordering (orderdate, orderkey tiebreak). The accumulating value is
    the exact cent-grid BIGINT sum — a float running sum re-rounds at
    every row, so one mid-stream ulp would flip every later cent."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(cents).over(w) / 100.0, 2).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# lag/lead: sessionization (gap > 30 min starts a new session).
# ---------------------------------------------------------------------------
@query(
    "sessionize_events",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions
    FROM gaps GROUP BY user_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag() + gap threshold — the standard batch
    pattern (streaming twin: session_window in streaming/events.py)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ms = F.unix_millis(F.lag("ts").over(w))
    new_session = F.when(
        prev_ms.isNull() | ((F.unix_millis(F.col("ts")) - prev_ms) > 1800000), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("long").alias("n_sessions"))
    )


# ---------------------------------------------------------------------------
# A3: distinct; A4: deterministic dedup (row_number == 1).
# ---------------------------------------------------------------------------
@query(
    "distinct_event_days",
    oracle="SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events",
)
def distinct_event_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct() on a derived column (reference A3, top10.py:260 — there
    it feeds a driver loop; here it IS the result, the loop is gone)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(F.date_format("ts", "yyyy-MM-dd").alias("day")).distinct()


@query(
    "dedup_latest_event_per_user_type",
    oracle="""
    SELECT user_id, event_type, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping a DETERMINISTIC winner (latest ts, then highest
    event_id). The reference's dropDuplicates (A4, top10.py:252) keeps an
    arbitrary row; at scale an arbitrary winner is irreproducible, so the
    engine's dedup is window-based."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


@query(
    "distinct_subset_lineitem",
    oracle="SELECT DISTINCT l_orderkey, l_returnflag, l_linestatus FROM lineitem",
)
def distinct_subset_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a column subset, projected to that subset — the
    deterministic core of reference A4 (platform_usage.py:225-229)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_returnflag", "l_linestatus").dropDuplicates()


# ---------------------------------------------------------------------------
# Rollup / grouping sets (generalizes A2's six hand-built granularities).
# ---------------------------------------------------------------------------
@query(
    "rollup_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
               AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — the relational-complete form of the reference's six
    hand-enumerated grouping granularities (A2, platform_usage.py:118-181):
    one shuffle computes every level."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(grid_sum(F.col("l_extendedprice"), 100), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_rows",
        )
    )


@query(
    "cube_orders_status_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(grid_sum(F.col("o_totalprice"), 100), 2).alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# Exact + approximate distinct counts (X6).
# ---------------------------------------------------------------------------
@query(
    "count_distinct_users_per_type",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def count_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def _approx_distinct_oracle() -> str:
    from ..operators.sketches import det_hll_oracle_sql

    return f"""
    SELECT event_type, approx_distinct AS approx_users
    FROM ({det_hll_oracle_sql("events", "event_type", "user_id")})
    """


@query("approx_distinct_users_per_type", oracle=_approx_distinct_oracle())
def approx_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per type — the HLL scale path for X6,
    via the cross-engine-DETERMINISTIC md5 HLL (operators/sketches.py::
    det_hll_estimate: fixed-point integer harmonic fold, 4-digit-rounded
    estimate) so the sketch itself is oracle-checkable, not rows-only.
    Engine-native sketches (approx_count_distinct HLL++, DataSketches
    hll_sketch_agg) remain the drop-in production alternatives — their
    error bounds and merge determinism are pytest-pinned
    (tests/test_operators.py); this gated twin pins the algorithm."""
    from ..operators.sketches import det_hll_estimate

    ev = load_table(spark, sf_dir, "events")
    return det_hll_estimate(ev, ["event_type"], "user_id").select(
        "event_type", F.col("approx_distinct").alias("approx_users")
    )


# ---------------------------------------------------------------------------
# Set operations (absent from the reference; §2.7 completeness).
# ---------------------------------------------------------------------------
@query(
    "union_distinct_keys",
    oracle="""
    SELECT c_custkey AS key FROM customer
    UNION
    SELECT o_custkey AS key FROM orders
    """,
)
def union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    return cust.union(orders).distinct()


@query(
    "except_customers_without_orders",
    oracle="""
    SELECT c_custkey AS key FROM customer
    EXCEPT
    SELECT o_custkey AS key FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    """,
)
def except_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — set-difference twin of the anti join, on the
    same 1999+ order restriction (non-empty at every SF)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("key"))
    )
    return cust.exceptAll(orders).distinct()


@query(
    "intersect_event_users_customers",
    oracle="""
    SELECT user_id AS key FROM events
    INTERSECT
    SELECT c_custkey AS key FROM customer
    """,
)
def intersect_event_users_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct)."""
    ev = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("key"))
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    return ev.intersect(cust)


# ---------------------------------------------------------------------------
# O1-O3: global top-K via ORDER BY + LIMIT (deterministic tiebreak).
# ---------------------------------------------------------------------------
@query(
    "global_topk_orders",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K: Spark plans ORDER BY+LIMIT as TakeOrderedAndProject —
    per-partition top-K then a K-sized merge on the driver, no full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


# ---------------------------------------------------------------------------
# P6/F5: conditional expressions.
# ---------------------------------------------------------------------------
@query(
    "conditional_order_classes",
    oracle="""
    SELECT CASE WHEN o_orderstatus = 'F' THEN 'fulfilled'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'partial' END AS status_class,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(CAST(ROUND(CASE WHEN o_totalprice > 100000
                                     THEN o_totalprice ELSE 0 END * 100)
                     AS BIGINT)) / 100.0, 2) AS big_order_total
    FROM orders GROUP BY 1
    """,
)
def conditional_order_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.when/otherwise chains (reference P6, royalties.py:231-233)."""
    o = load_table(spark, sf_dir, "orders")
    status_class = (
        F.when(F.col("o_orderstatus") == "F", "fulfilled")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
    )
    big = F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice")).otherwise(0.0)
    return (
        o.groupBy(status_class.alias("status_class"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(grid_sum(big, 100), 2).alias("big_order_total"),
        )
    )


# ---------------------------------------------------------------------------
# F1: ISO-string substring extraction (date / month / tz offset).
# ---------------------------------------------------------------------------
@query(
    "substring_time_parts",
    oracle="""
    SELECT SUBSTRING(iso, 1, 10) AS day, SUBSTRING(iso, 1, 7) AS month,
           SUBSTRING(iso, 20, 6) AS tz_offset,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+00:00' AS iso FROM events)
    GROUP BY 1, 2, 3
    """,
)
def substring_time_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's F1 idiom: 1-indexed SUBSTRING over ISO-8601 strings
    — chars 1-10 date (top10.py:184-185), 1-7 month
    (platform_usage.py:76-77), 20-25 offset (platform_usage.py:80-81)."""
    ev = load_table(spark, sf_dir, "events")
    iso = F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("+00:00"))
    return (
        ev.select(iso.alias("iso"))
        .select(
            F.substring("iso", 1, 10).alias("day"),
            F.substring("iso", 1, 7).alias("month"),
            F.substring("iso", 20, 6).alias("tz_offset"),
        )
        .groupBy("day", "month", "tz_offset")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# F2: regex zero-pad normalization ("3.5" → "3.05").
# ---------------------------------------------------------------------------
@query(
    "regex_normalize_dotted_ids",
    # DuckDB's RE2 lacks lookahead, so the oracle uses the capture-group
    # equivalent of the reference's `\.(?=\d)` → `.0`.
    oracle=r"""
    SELECT p_partkey, dotted,
           regexp_replace(dotted, '\.(\d)', '.0\1') AS normalized
    FROM (SELECT p_partkey,
                 CAST(p_size AS VARCHAR) || '.' || CAST(p_partkey % 10 AS VARCHAR) AS dotted
          FROM part)
    """,
)
def regex_normalize_dotted_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-pad normalization of dotted ids (reference F2,
    top10.py:79-81 / royalties.py:88-90: regexp_replace(categoryId,
    r'\\.(?=\\d)', '.0')). Spark's Java regex supports the original
    lookahead form; used verbatim here."""
    p = load_table(spark, sf_dir, "part")
    dotted = F.concat(
        F.col("p_size").cast("string"), F.lit("."), (F.col("p_partkey") % 10).cast("string")
    )
    return p.select(
        "p_partkey",
        dotted.alias("dotted"),
        F.regexp_replace(dotted, r"\.(?=\d)", ".0").alias("normalized"),
    )


# ---------------------------------------------------------------------------
# F3: format_number fidelity (string output with thousands separators).
# ---------------------------------------------------------------------------
@query(
    "format_number_prices",
    # DuckDB's format() rejects thousands separators on floats, so the
    # oracle rebuilds the grouped string from rounded cents.
    oracle="""
    SELECT o_orderkey,
           format('{:,}', CAST(c AS BIGINT) // 100) || '.' ||
           lpad(CAST(CAST(c AS BIGINT) % 100 AS VARCHAR), 2, '0') AS price_s
    FROM (SELECT o_orderkey, round(o_totalprice * 100) AS c
          FROM orders WHERE o_orderkey <= 200)
    """,
)
def format_number_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_number(x, 2) — the reference's string-money quirk
    (royalties.py:232). Kept as a declared fidelity operator; canonical
    pipelines use numeric round() instead."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") <= 200).select(
        "o_orderkey", F.format_number("o_totalprice", 2).alias("price_s")
    )


# ---------------------------------------------------------------------------
# Pivot (engine completeness; oracle via conditional aggregation).
# ---------------------------------------------------------------------------
@query(
    "pivot_quantity_by_status",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O'
                          THEN CAST(ROUND(l_quantity * 100) AS BIGINT)
                          ELSE 0 END) / 100.0, 2) AS qty_o,
           ROUND(SUM(CASE WHEN l_linestatus = 'F'
                          THEN CAST(ROUND(l_quantity * 100) AS BIGINT)
                          ELSE 0 END) / 100.0, 2) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_quantity_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct-values job)."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")))
    )
    return pivoted.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("O"), F.lit(0)) / 100.0, 2).alias("qty_o"),
        F.round(F.coalesce(F.col("F"), F.lit(0)) / 100.0, 2).alias("qty_f"),
    )


# ---------------------------------------------------------------------------
# Q1/Q2 + U1: SQL surface over temp views with a registered Python UDF.
# ---------------------------------------------------------------------------
@query(
    "sql_udf_usage_percent",
    oracle="""
    WITH per_type AS (
        SELECT event_type,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS type_cents
        FROM events GROUP BY event_type
    ), total AS (
        SELECT CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM events
    )
    SELECT event_type,
           ROUND(CAST(type_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) * 100, 4)
               AS usage_pct
    FROM per_type, total
    """,
)
def sql_udf_usage_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one UDF (U1, platform_usage.py:104-107:
    usage_percent(a,b) = a/b*100, DoubleType) registered and called
    through spark.sql over temp views (Q1/Q2 surface,
    platform_usage.py:202-221). Division semantics: null on null input;
    b=0 yields null in the engine (documented deviation from the
    reference's ZeroDivisionError). The ratio's numerator/denominator
    are exact cent-grid BIGINT sums so the one division is the same
    correctly-rounded IEEE op on both engines."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_v")

    def usage_percent(a, b):
        if a is None or b is None or b == 0:
            return None
        return a / b * 100.0

    spark.udf.register("usage_percent", usage_percent, T.DoubleType())
    return spark.sql(
        """
        WITH per_type AS (
            SELECT event_type,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS type_cents
            FROM events_v GROUP BY event_type
        ), total AS (
            SELECT SUM(CAST(ROUND(value * 100) AS BIGINT)) AS total_cents
            FROM events_v
        )
        SELECT event_type,
               ROUND(usage_percent(CAST(type_cents AS DOUBLE),
                                   CAST(total_cents AS DOUBLE)), 4) AS usage_pct
        FROM per_type CROSS JOIN total
        """
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (generalizes rollup/cube; SQL surface).
# ---------------------------------------------------------------------------
@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
               AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the exact relational form of the
    reference's six hand-enumerated aggregation granularities
    (platform_usage.py:118-181), via the SQL surface."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               -- Spark SQL parses the 100.0 literal as DECIMAL(4,1) (unlike
               -- DuckDB, where this division is DOUBLE); without the DOUBLE
               -- cast the result collects as Decimal('x.60') vs the oracle's
               -- double x.6 — caught by the ×10 differential.
               ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                     / CAST(100 AS DOUBLE), 2) AS revenue
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Exact percentiles (interpolated) per group.
# ---------------------------------------------------------------------------
@query(
    "percentiles_price_by_flag",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines use the same linear
    interpolation definition). The approximate scale path is
    percentile_approx — see approx_percentiles_price."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
    )


_PRICE_QUANTILES = [("p50_cents", 1, 2), ("p90_cents", 9, 10)]


def _approx_percentiles_oracle() -> str:
    from ..operators.sketches import histogram_percentiles_oracle_sql

    return histogram_percentiles_oracle_sql(
        "lineitem", "l_returnflag", "l_extendedprice", _PRICE_QUANTILES
    )


@query("approx_percentiles_price", oracle=_approx_percentiles_oracle())
def approx_percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles at scale WITHOUT the per-group full sort:
    cent-quantized mergeable histogram (operators/sketches.py::
    histogram_percentiles) — rank arithmetic is pure integers, the
    histogram state is an ordinary (key, bin, count) table mergeable
    across batches, and the answer is deterministic on every engine
    (grid error ≤ 1 cent, zero rank error). percentile_approx's
    KLL-style sketch stays the engine-native alternative, its error
    bound pytest-pinned against the exact percentile
    (tests/test_operators.py)."""
    from ..operators.sketches import histogram_percentiles

    li = load_table(spark, sf_dir, "lineitem")
    return histogram_percentiles(
        li, ["l_returnflag"], "l_extendedprice", _PRICE_QUANTILES
    )


def _hll_overlap_oracle() -> str:
    from ..operators.sketches import det_hll_overlap_oracle_sql

    return det_hll_overlap_oracle_sql("events", "event_type", "user_id")


@query("approx_user_overlap_event_types", oracle=_hll_overlap_oracle())
def approx_user_overlap_event_types(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """HLL SET ALGEBRA in the gate: pairwise user-audience overlap
    between event types by inclusion–exclusion over the deterministic
    md5-HLL register tables — |A∩B| ≈ est(A)+est(B)−est(A∪B), where the
    union sketch is the register-wise MAX (operators/sketches.py:
    det_hll_pairwise_overlap). The question a 100 TB fact would need a
    self-join of user sets to answer exactly, answered from KB-scale
    sketch state; the register MERGEABILITY that hll_merge_partials
    pytest-pins is here exercised inside the hash gate itself (a merge
    bug changes every union estimate). Accuracy vs the exact overlaps
    is pinned in tests/test_operators.py."""
    from ..operators.sketches import det_hll_pairwise_overlap

    ev = load_table(spark, sf_dir, "events")
    return det_hll_pairwise_overlap(ev, "event_type", "user_id")


def _heavy_hitters_oracle() -> str:
    from ..operators.sketches import cms_oracle_sql

    return cms_oracle_sql(
        "(SELECT CAST(ROUND(value * 100) AS BIGINT) // 1000 AS vbucket "
        "FROM events) ev",
        "vbucket", support_ppm=50000,
    )


@query("events_heavy_hitter_value_buckets", oracle=_heavy_hitters_oracle())
def events_heavy_hitter_value_buckets(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Frequent-items via a deterministic count-min sketch
    (operators/sketches.py:cms_heavy_hitters): value-cent buckets
    holding ≥ 5 % of all events, found by probing a 4×256 md5-hashed
    counter table and verified with exact counts over ONLY the sketch's
    candidates (CMS never undercounts, so verified output is the exact
    answer set; est_count > n_exact rows in the output are visible
    collision overestimates the verify survived). The threshold compare
    is integer ppm arithmetic — no division — and the sketch is an
    ordinary (row, slot, n) DataFrame: mergeable across batches by
    summing counters, constant size, the 100 TB path where exact
    per-key counting of a huge key universe is the thing you avoid."""
    from ..operators.sketches import cms_heavy_hitters

    ev = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(ROUND(value * 100) AS BIGINT) div 1000")
        .alias("vbucket")
    )
    return cms_heavy_hitters(ev, "vbucket", support_ppm=50000)


# ---------------------------------------------------------------------------
# As-of (point-in-time) join — no native Spark primitive; union+window
# composition (operators/asof.py).
# ---------------------------------------------------------------------------
@query(
    "asof_last_order_before_event",
    oracle="""
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           strftime((SELECT max(o.o_orderdate) FROM orders o
                     WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts),
                    '%Y-%m-%d') AS last_order_date
    FROM events e
    """,
)
def asof_last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the most recent order (same user)
    at-or-before its timestamp. One shuffle of events+orders via the
    tagged-union window composition — no per-key cross product."""
    from ..operators import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    out = asof_join(ev, orders, on="user_id", left_time="ts",
                    right_time="o_orderdate", payload=["o_orderdate"])
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.date_format("o_orderdate_asof", "yyyy-MM-dd").alias("last_order_date"),
    )


@query(
    "event_training_sequences",
    oracle="""
    WITH gaps AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT *, SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM gaps
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           STRING_AGG(event_type, ' ' ORDER BY ts, event_id) AS sequence
    FROM sess GROUP BY user_id, session_idx
    """,
)
def event_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral training sequences: each user session (30-min gap
    rule, same sessionization as sessionize_events) becomes one ordered
    event-type sequence string — the events→sequence-corpus bridge a
    behavior-model pipeline trains on. Ordering is fully deterministic
    ((ts, event_id) — event_id unique), made shuffle-safe by sorting
    INSIDE the aggregate: array_sort over collect_list of (ts, event_id,
    type) structs, then project + join. Two window passes + one grouped
    agg, all on the same user_id partitioning, so the fact shuffles
    once."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ms = F.unix_millis(F.lag("ts").over(w))
    new_session = F.when(
        prev_ms.isNull()
        | ((F.unix_millis(F.col("ts")) - prev_ms) > 1800000), 1
    ).otherwise(0)
    run = W.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = (
        ev.withColumn("new_session", new_session)
        .withColumn("session_idx",
                    F.sum("new_session").over(run).cast("long"))
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.array_join(
                F.transform(ordered, lambda s: s["event_type"]), " "
            ).alias("sequence"),
        )
    )
