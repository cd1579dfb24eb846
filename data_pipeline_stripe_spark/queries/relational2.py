"""Second relational batch: semi-structured JSON props, time functions,
ntile, multi-column statistics, unpivot, and batch session windows.

The reference parses JSON in driver Python before Spark ever sees it
(top10.py:153); here semi-structured parsing is an engine operator
(get_json_object / from_json) so it distributes and prunes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from ..sources import load_table
from ._grid import grid_sum
from .registry import query


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)) / 10000.0, 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two-fact join → grouped
    revenue → global top-10. The customer filter broadcasts; both date
    predicates push to the scans."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.round(
                grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000),
                2,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "priority")
    )


@query(
    "q5_supplier_customer_by_nation",
    oracle="""
    SELECT n.n_name AS nation_name,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)) / 10000.0, 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def q5_supplier_customer_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: region-filtered star with the co-nation predicate
    (customer and supplier in the same nation) applied across joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    reg = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(
                grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000),
                2,
            ).alias("revenue")
        )
    )


@query(
    "q4_order_priority_checking",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated inequality — expressed as
    a left-semi join on (key, condition); Catalyst decorrelates the SQL
    form to the same plan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
                 / 7.0, 2) AS avg_yearly
    FROM (
        SELECT l.l_extendedprice,
               CAST(ROUND(l.l_quantity * 100) AS BIGINT) AS qty_c,
               SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT))
                   OVER (PARTITION BY l.l_partkey) AS part_qty_c,
               COUNT(*) OVER (PARTITION BY l.l_partkey) AS part_n
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
    ) WHERE qty_c * 5 * part_n < part_qty_c
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG subquery — decorrelated
    into a window average per part (one shuffle on the partkey instead of
    a per-row subquery). The `qty < 0.2·AVG(qty)` predicate is
    cross-multiplied to exact integers (`qty·5·n < Σqty` on the cent
    grid): a float AVG one ulp off the 0.2 boundary would flip the strict
    comparison — same disease as the compared float sums."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    )
    w = W.partitionBy("l_partkey")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .withColumn("qty_c", qty_c)
        .withColumn("part_qty_c", F.sum(qty_c).over(w))
        .withColumn("part_n", F.count("*").over(w))
        .filter(F.col("qty_c") * 5 * F.col("part_n") < F.col("part_qty_c"))
        .agg(
            F.round(grid_sum(F.col("l_extendedprice"), 100) / 7.0, 2)
            .alias("avg_yearly")
        )
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: aggregate over an aggregate — outer-join order
    counts per customer, then the distribution of those counts (keeps
    zero-order customers via the left join + count of non-nulls)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "histogram_order_totals",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via bucket quantization — the distributed
    form of a value-distribution profile (one shuffle on bucket id)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT)
               AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_sum
    FROM events GROUP BY 1
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props parsing as an engine operator. The reference
    does json.loads on the driver (top10.py:153); from_json/get_json_object
    runs distributed and participates in pruning."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))["k"]
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.sum("k").alias("k_sum"))
    )


@query(
    "date_trunc_weekly_activity",
    oracle="""
    SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
           CAST(dayofweek(ts) AS INT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def date_trunc_weekly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed time functions (the canonical alternative to the reference's
    ISO-string substring slicing, F1): date_trunc + day-of-week. Spark's
    dayofweek is 1-based Sunday-first; normalized to DuckDB's 0-based."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week_start"),
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        )
        .groupBy("week_start", "dow")
        .agg(F.count("*").alias("n"))
    )


@query(
    "ntile_customer_quartiles",
    oracle="""
    SELECT CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT)
               AS quartile,
           c_custkey, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    """,
)
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile over a fully deterministic GLOBAL ordering — routed
    through the two-phase prefix-sum rank (operators/packing.py:
    global_ntile) instead of the naive ``NTILE(4) OVER (ORDER BY ...)``
    whose plan is an ``Exchange SinglePartition`` funneling the whole
    table through one task (VERDICT r10 item 7; the oracle states the
    naive form — results are bit-identical by NTILE's spec). The plan
    pin (tests/test_plans.py) asserts no single-partition window
    exec survives in this query's plan beyond the B-row offsets
    frame."""
    from ..operators.packing import global_ntile

    cust = load_table(spark, sf_dir, "customer")
    tiled = global_ntile(
        cust, [F.col("c_acctbal").desc(), F.col("c_custkey")], 4,
        n_buckets=32, out_col="_q")
    return tiled.select(
        F.col("_q").cast("int").alias("quartile"),
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
    )


@query(
    "stats_price_quantity",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 3) AS price_stddev,
           ROUND(avg(l_quantity), 4) AS qty_avg,
           ROUND(corr(l_extendedprice, l_quantity), 4) AS price_qty_corr
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev + Pearson correlation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 3).alias("price_stddev"),
        F.round(F.avg("l_quantity"), 4).alias("qty_avg"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
    )


@query(
    "unpivot_price_components",
    oracle="""
    SELECT l_orderkey, l_linenumber, comp, ROUND(val, 2) AS val
    FROM (
        SELECT l_orderkey, l_linenumber, 'price' AS comp, l_extendedprice AS val
        FROM lineitem WHERE l_orderkey <= 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount
        FROM lineitem WHERE l_orderkey <= 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax
        FROM lineitem WHERE l_orderkey <= 100
    )
    """,
)
def unpivot_price_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long melt) via stack — the inverse of pivot."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'price', l_extendedprice, 'discount', l_discount, "
            "'tax', l_tax) AS (comp, raw_val)"
        ),
    ).select("l_orderkey", "l_linenumber", "comp", F.round("raw_val", 2).alias("val"))


@query(
    "range_join_cooccurring_events",
    oracle="""
    WITH e AS (SELECT event_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                      event_type
               FROM events),
    lhs AS (SELECT event_id, sec, event_type, sec // 60 AS b FROM e),
    rhs AS (SELECT event_id, sec, event_type,
                   unnest([sec // 60 - 1, sec // 60, sec // 60 + 1]) AS b
            FROM e)
    SELECT lhs.event_type AS type_a, rhs.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM lhs JOIN rhs ON lhs.b = rhs.b
    WHERE lhs.event_id < rhs.event_id
      AND abs(lhs.sec - rhs.sec) <= 60
    GROUP BY 1, 2
    """,
)
def range_join_cooccurring_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: event pairs within 60 seconds of each other, counted
    per type pair. Implemented with the bucketized equi-join
    (operators/range_join.py) — a keyed shuffle, not the O(n²)
    nested-loop Spark would plan for the raw inequality.

    Oracle form (r9): the spec predicate — |sec_a − sec_b| <= 60 over
    second-truncated timestamps, event_id-ordered pairs — is the WHERE
    clause verbatim; candidate generation is pre-bucketed (60 s minute
    buckets, one side expanded to its 3 neighbors) so DuckDB plans a
    hash join instead of the IEJoin whose ~×100 pair intermediate
    ground >6 h on the ×10 replicated fixture (NOTES_r6 cont-4; this
    rewrite closed VERDICT r8 item 6). The bucketing is exactly
    sound: |sec diff| <= 60 implies |minute-bucket diff| <= 1 (a
    2-bucket gap needs a diff >= 61), and each qualifying pair matches
    exactly one expanded bucket value, so the rewrite counts precisely
    the spec's pairs."""
    from ..operators import range_join

    ev = load_table(spark, sf_dir, "events")
    a = ev.select(F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"),
                  F.col("event_type").alias("type_a"))
    b = ev.select(F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b"),
                  F.col("event_type").alias("type_b"))
    return (
        # clock="seconds": this query's DECLARED semantics (and its
        # oracle) compare second-truncated timestamps — the operator's
        # default is now exact microseconds
        range_join(a, b, "ts_a", "ts_b", 60, clock="seconds")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "collect_set_event_types_per_user",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def collect_set_event_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set rendered to a sorted joined string (array outputs are
    kept out of oracle-compared results; ordering inside a set is
    engine-arbitrary, sorting makes it canonical)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("types"),
        F.count("*").alias("n_events"),
    )


@query(
    "max_by_latest_event_value",
    oracle="""
    SELECT event_type,
           CAST(max_by(event_id, event_id) AS BIGINT) AS latest_event_id,
           ROUND(max_by(value, event_id), 2) AS latest_value
    FROM events GROUP BY event_type
    """,
)
def max_by_latest_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/arg-max aggregation with a UNIQUE ordering column
    (event_id) — arbitrary tie-breaks don't survive oracle comparison or
    cluster retries, so the engine always arg-maxes on a key."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", "event_id").alias("latest_event_id"),
        F.round(F.max_by("value", "event_id"), 2).alias("latest_value"),
    )


@query(
    "lead_lag_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           (epoch_ms(LEAD(o_orderdate) OVER wo) - epoch_ms(o_orderdate))
               // 86400000 AS days_to_next,
           strftime(FIRST_VALUE(o_orderdate) OVER wf, '%Y-%m-%d') AS first_orderdate
    FROM orders
    WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def lead_lag_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead (offset function, frameless window) + first_value (explicit
    full-partition frame): days until each customer's next order and
    their first order date."""
    orders = load_table(spark, sf_dir, "orders")
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = wo.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    # o_orderdate is TIMESTAMP_NTZ from parquet; unix_millis needs an
    # instant — cast under the UTC session so wall time == epoch time.
    ts = F.col("o_orderdate").cast("timestamp")
    next_ms = F.unix_millis(F.lead(ts).over(wo))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.floor((next_ms - F.unix_millis(ts)) / 86400000)
        .cast("long").alias("days_to_next"),
        F.date_format(F.first_value("o_orderdate").over(wf), "yyyy-MM-dd")
        .alias("first_orderdate"),
    )


# Shared with the streaming gate (stream_session_window_parity, which
# uses a wider gap so sessions straddle its micro-batch cuts): the
# drained stream must hash-match the same lag/cumsum construction.
def session_window_oracle(gap_ms: int, gap_interval: str) -> str:
    return f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > {gap_ms}
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        -- ORDER BY ts alone is not a total order: under tied timestamps
        -- (the ×10 replicated fixture has every event 10-fold tied) the
        -- running sum splits the tied copies of a session-head row
        -- arbitrarily around its new_session flag, leaking copies into
        -- the previous session. The tiebreaker must match flagged's.
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start_s,
           strftime(MAX(ts) + INTERVAL {gap_interval}, '%Y-%m-%d %H:%M:%S')
               AS session_end_s,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered GROUP BY user_id, sess_id
    """


@query("session_window_batch", oracle=session_window_oracle(1800000, "30 MINUTE"))
def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window in BATCH mode (gap-merged event-time
    sessions) — the declarative form of the lag/cumsum construction the
    oracle uses; also the exact batch twin of
    streaming.sessionized_event_counts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("session_start_s"),
            F.date_format("win.end", "yyyy-MM-dd HH:mm:ss").alias("session_end_s"),
            "n_events",
        )
    )


@query(
    "price_quantiles_by_flag",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.95]) AS qs
        FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           CAST(generate_subscripts(qs, 1) - 1 AS BIGINT) AS q_idx,
           ROUND(unnest(qs), 4) AS price_q
    FROM agg
    """,
)
def price_quantiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p25/50/75/95 of extended price per
    return flag): Spark `percentile` and DuckDB `quantile_cont` share the
    linear-interpolation definition, so the oracle is exact. Scale note:
    exact percentile is a sort-based aggregate — the 100 TB path is
    approx_percentile (mergeable t-digest, one pass), same query shape;
    exact stays correct here because group cardinality (3 flags), not
    fact size, bounds the state."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice",
                     F.lit([0.25, 0.5, 0.75, 0.95])).alias("qs")
    )
    return agg.select(
        "l_returnflag",
        F.posexplode("qs").alias("q_idx", "_q"),
    ).select(
        "l_returnflag",
        F.col("q_idx").cast("long").alias("q_idx"),
        F.round("_q", 4).alias("price_q"),
    )


@query(
    "udaf_weighted_avg_price_by_flag",
    oracle="""
    SELECT l_returnflag,
           FLOOR(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                          * CAST(l_quantity AS HUGEINT)) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS HUGEINT)) AS DOUBLE)
                 * 1e4) / 1e4 AS weighted_avg_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg_price_by_flag(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Custom aggregate via a GROUPED_AGG pandas UDF — the UDAF
    extension point the reference lacks (SURVEY §2.10: 'No UDAF'): a
    quantity-weighted mean unit price per return flag, Arrow-batched so
    each group's columns arrive as one numpy-backed Series, never
    row-at-a-time. The kernel accumulates in int64 (cents × integral
    quantities — exact; sums < 2^53 through sf1 so the final
    int→double cast is lossless) and divides once, making the double
    deterministic; both sides floor-truncate at 1e-4 for display.

    Scale note: GROUPED_AGG ships each group through Arrow whole — fine
    at dozens-of-groups grain like this; for high-cardinality or
    giant groups prefer expression moments (corr_qty_price_by_flag)."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: this module's `from __future__
    # import annotations` stringifies hints, so signature inference
    # can't see Series -> scalar.
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def weighted_avg_cents(cents: pd.Series, qty: pd.Series) -> float:
        num = int((cents.astype("int64") * qty.astype("int64")).sum())
        den = int(qty.astype("int64").sum())
        return float(num) / float(den)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long")
            .alias("_cents"),
            F.col("l_quantity").cast("long").alias("_qty"),
        )
        .groupBy("l_returnflag")
        .agg(
            (F.floor(weighted_avg_cents("_cents", "_qty") * 1e4) / 1e4)
            .alias("weighted_avg_cents")
        )
    )


@query(
    "udtf_top_bigrams",
    oracle=r"""
    WITH docs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents WHERE doc_id % 100 = 0),
    bi AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
           FROM docs, unnest(range(1, len(t))) AS ti(i)
           WHERE len(t) >= 2),
    cnt AS (SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS n
            FROM bi GROUP BY 1, 2),
    ranked AS (SELECT doc_id, bigram, n,
                      ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY n DESC, bigram) AS rk
               FROM cnt)
    SELECT doc_id, bigram, n, CAST(rk AS INT) AS rank
    FROM ranked WHERE rk <= 3
    """,
)
def udtf_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4): a table function emitting each
    document's top-3 token bigrams (count desc, bigram asc tiebreak —
    fully deterministic), invoked through SQL with LATERAL correlation —
    the 1→N extension point for per-row expansion logic too imperative
    for expressions. Restricted to doc_id % 100 == 0 (non-degenerate
    but small: the UDTF is an API-surface proof, and per-row Python is
    the documented slow path — the distributed twin of this exact logic
    is doc_repetition_score's explode + grouped count)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram string, n bigint, rank int")
    class TopBigrams:
        def eval(self, text: str):
            if text is None:  # NULL text ⇒ no bigrams (matches the oracle)
                return
            toks = text.strip().split()
            counts: dict[str, int] = {}
            for a, b in zip(toks, toks[1:]):
                bg = f"{a} {b}"
                counts[bg] = counts.get(bg, 0) + 1
            top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
            for i, (bg, n) in enumerate(top):
                yield bg, n, i + 1

    spark.udtf.register("top_bigrams", TopBigrams)
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 100 == 0).createOrReplaceTempView(
        "docs_sample_v"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.bigram, t.n, t.rank
        FROM docs_sample_v d, LATERAL top_bigrams(d.text) t
        """
    )


@query(
    "merge_upsert_customers",
    oracle="""
    WITH upd AS (
        SELECT c_custkey, c_name, c_nationkey,
               ROUND(c_acctbal + 100, 2) AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey + 10000000, 'NEW-' || CAST(c_custkey AS VARCHAR),
               c_nationkey, ROUND(c_acctbal, 2), 'MACHINERY'
        FROM customer WHERE c_custkey % 11 = 0
    )
    SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
           COALESCE(u.c_name, b.c_name) AS c_name,
           COALESCE(u.c_nationkey, b.c_nationkey) AS c_nationkey,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
                ELSE ROUND(b.c_acctbal, 2) END AS c_acctbal,
           COALESCE(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
           CASE WHEN u.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL
                THEN 'updated'
                WHEN u.c_custkey IS NOT NULL THEN 'inserted'
                ELSE 'kept' END AS merge_action
    FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) as a DataFrame transform — the incremental-
    corrections primitive every lakehouse user has and plain parquet
    lacks (see README's lakehouse note): a deterministic update batch
    (every 7th customer gets +100 balance; every 11th spawns a NEW-
    prefixed insert under a shifted key) full-outer-merged into the base
    on the key, with a merge_action audit column. One keyed join, AQE
    free to broadcast the (small) batch — operators/merge.py. Balances
    are rounded to cents on BOTH sides before compare (per-row ROUND is
    engine-exact; the +100 arithmetic stays in doubles)."""
    from ..operators.merge import merge_upsert

    cust = load_table(spark, sf_dir, "customer")
    # normalize cents on both branches so base/update doubles render
    # identically in the oracle's COALESCE
    base = cust.withColumn("c_acctbal", F.round("c_acctbal", 2))
    updates = (
        base.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100, 2))
        .unionByName(
            base.filter(F.col("c_custkey") % 11 == 0).select(
                (F.col("c_custkey") + 10000000).alias("c_custkey"),
                F.concat(F.lit("NEW-"), F.col("c_custkey").cast("string"))
                .alias("c_name"),
                "c_nationkey",
                "c_acctbal",
                F.lit("MACHINERY").alias("c_mktsegment"),
            )
        )
    )
    return merge_upsert(base, updates, "c_custkey")


@query(
    "percent_rank_supplier_balance",
    oracle="""
    SELECT s_suppkey, n_nationkey AS nation_key,
           FLOOR(PERCENT_RANK() OVER (
               PARTITION BY n_nationkey
               ORDER BY ROUND(s_acctbal * 100), s_suppkey) * 1e6) / 1e6
               AS balance_pct_rank,
           FLOOR(CUME_DIST() OVER (
               PARTITION BY n_nationkey
               ORDER BY ROUND(s_acctbal * 100), s_suppkey) * 1e6) / 1e6
               AS balance_cume_dist
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def percent_rank_supplier_balance(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Relative-rank window functions (percent_rank + cume_dist) —
    rounding out the window surface beyond rank/dense_rank/ntile/lag/
    lead/first_value. Ordering is on integer cents with a key tiebreak
    so ranks are fully deterministic; both ratios are exact small
    rationals ((rank-1)/(n-1), cum/n) evaluated identically by both
    engines, floor-truncated for display. One shuffle on the partition
    key; same WindowExec shape as every ranking query here."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    w = W.partitionBy("n_nationkey").orderBy(
        F.round(F.col("s_acctbal") * 100), F.col("s_suppkey")
    )
    return (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .select(
            "s_suppkey",
            F.col("n_nationkey").alias("nation_key"),
            (F.floor(F.percent_rank().over(w) * 1e6) / 1e6)
            .alias("balance_pct_rank"),
            (F.floor(F.cume_dist().over(w) * 1e6) / 1e6)
            .alias("balance_cume_dist"),
        )
    )


@query(
    "scd2_customer_priority_history",
    oracle="""
    WITH c AS (
        SELECT o_custkey, o_orderdate, o_orderpriority, o_orderkey,
               LAG(o_orderpriority) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ), kept AS (
        SELECT o_custkey, o_orderdate, o_orderpriority, o_orderkey
        FROM c WHERE rn = 1 OR o_orderpriority IS DISTINCT FROM prev
    )
    SELECT o_custkey AS custkey,
           o_orderpriority AS priority,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           LEAD(o_orderdate) OVER w IS NULL AS is_current
    FROM kept
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def scd2_customer_priority_history(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension (operators/scd.py) with each
    customer's order stream as the change log and o_orderpriority as the
    tracked attribute: one row per consecutive-distinct priority with
    [valid_from, valid_to) validity, version number, and is_current —
    the warehouse history operator the reference's snapshot re-reads
    can't express (reference top10.py:87-114 loses history each run).
    One shuffle: every window shares the (custkey → orderdate, orderkey)
    partitioning. Validity bounds render as date strings on both
    engines; the DuckDB twin splits lag-filter and lead-interval into
    two CTEs (window calls cannot nest there)."""
    from ..operators.scd import scd2_from_changes

    orders = load_table(spark, sf_dir, "orders")
    changes = orders.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderdate",
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
    )
    scd = scd2_from_changes(changes, key="custkey", ts="o_orderdate",
                            attrs=["priority"], tiebreak="o_orderkey")
    return scd.select(
        "custkey",
        "priority",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "version",
        "is_current",
    )
