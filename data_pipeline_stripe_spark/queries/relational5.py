"""Fifth batch: temporal and graph-analytic operators past the
reference's report surface — point-in-time (as-of) lookup against an
SCD2 dimension, incremental view maintenance by partial-state merge,
degree-ordered triangle counting, a Z-order clustering key for
multi-dimension data skipping, MATCH_RECOGNIZE-style sequence pattern
counts, time-weighted averages, and daily gap-fill with forward fill.

Each query is one-or-two shuffles on its natural key and exact in
integer arithmetic (SCALING.md cross-engine numeric policy), so the
DuckDB twin is a transcription, not an approximation. The reference
stack re-reads snapshots and loops in the driver (reference
top10.py:87-114, royalties.py:232); these are the warehouse-native
versions of the history/maintenance work those loops cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources import load_table
from ..sources.readers import inline_dim
from .registry import query


@query(
    "scd2_pit_lineitem_priority",
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
    ), hist AS (
        SELECT o_custkey AS custkey,
               o_orderpriority AS priority,
               o_orderdate AS valid_from,
               LEAD(o_orderdate) OVER w AS valid_to
        FROM kept
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), fact AS (
        SELECT o.o_custkey AS custkey, l.l_shipdate, l.l_extendedprice
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT h.priority AS priority_at_ship,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(f.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM fact f
    LEFT JOIN hist h
      ON f.custkey = h.custkey
     AND h.valid_from <= f.l_shipdate
     AND (h.valid_to IS NULL OR h.valid_to > f.l_shipdate)
    GROUP BY 1
    """,
)
def scd2_pit_lineitem_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each lineitem fact looks up the customer's
    SCD2 priority version valid at its ship date. The oracle expresses it
    as the textbook interval join (valid_from <= t < valid_to); the
    engine uses the scalable shape — the SCD2 history (operators/scd.py)
    as the change stream and the union-window as-of join
    (operators/asof.py): ONE shuffle of facts+versions per custkey, no
    range-join fan-out, which is what survives a 100 TB fact side.
    Version rides first in the as-of payload struct so same-day versions
    resolve to the latest (mirrors the oracle's zero-width-interval
    exclusion)."""
    from ..operators.asof import asof_join
    from ..operators.scd import scd2_from_changes

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    hist = scd2_from_changes(
        orders.select("o_custkey", "o_orderdate", "o_orderpriority",
                      "o_orderkey"),
        key="o_custkey", ts="o_orderdate", attrs=["o_orderpriority"],
        tiebreak="o_orderkey",
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.col("valid_from"),
        "version",
        F.col("o_orderpriority").alias("priority"),
    )
    fact = lineitem.select("l_orderkey", "l_shipdate", "l_extendedprice").join(
        orders.select("o_orderkey", F.col("o_custkey").alias("custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("custkey", "l_shipdate", "l_extendedprice")

    pit = asof_join(fact, hist, on="custkey", left_time="l_shipdate",
                    right_time="valid_from", payload=["version", "priority"])
    return pit.groupBy(F.col("priority_asof").alias("priority_at_ship")).agg(
        F.count("*").alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
         .alias("revenue_cents"),
    )


@query(
    "ivm_merge_revenue_by_month",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def ivm_merge_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance by partial-state merge: the monthly
    revenue view is maintained as mergeable partial aggregates (sum,
    count are commutative monoids), so a delta batch re-aggregates ONLY
    its own rows and merges with the stored base state — never a full
    recompute. Here base = orders before 1998, delta = the rest; the
    oracle is the full recompute, so a hash match proves
    merge(partial(base), partial(delta)) == full. At 100 TB this is the
    difference between an hourly ingest touching one partition and
    rescanning the lake; the same decomposition is what Spark itself
    does map-side (partial_sum) inside one job."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.sum(cents).alias("revenue_cents"),
            F.count("*").alias("n_orders"),
        )

    split = F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    base_state = partial(orders.filter(split))
    delta_state = partial(orders.filter(~split))
    return (
        base_state.unionByName(delta_state)
        .groupBy("month")
        .agg(F.sum("revenue_cents").alias("revenue_cents"),
             F.sum("n_orders").alias("n_orders"))
    )


@query(
    "triangle_count_copurchase",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM pairs
            UNION ALL
            SELECT v AS node FROM pairs
        ) GROUP BY node
    ), oriented AS (
        SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END
                   AS src,
               CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END
                   AS dst
        FROM pairs p
        JOIN deg du ON p.u = du.node
        JOIN deg dv ON p.v = dv.node
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*)
                 FROM oriented e1
                 JOIN oriented e2 ON e1.dst = e2.src
                 JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst)
                AS BIGINT) AS n_triangles
    """,
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the part co-purchase graph (edge = two parts in
    the same order) with the degree-ordering trick: orient every edge
    from its lower-(degree, id) endpoint to the higher, so each triangle
    is counted exactly once AND the wedge join's fan-out is bounded by
    out-degree ≤ O(sqrt(edges)) on any graph — the standard distributed
    triangle algorithm (three hash joins, no high-degree hub explosion).
    Unoriented wedge counting would square the hottest part's degree;
    orientation is what makes this survive a power-law graph at scale.
    All three joins are keyed; counts are exact integers."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count("*").alias("d"))
    )
    with_deg = (
        pairs.join(deg.select(F.col("node").alias("u"),
                              F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")),
              "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(e3, (F.col("e3.src") == F.col("e1.src"))
              & (F.col("e3.dst") == F.col("e2.dst")))
        .agg(F.count("*").alias("n_triangles"))
    )
    summary = (
        deg.agg(F.count("*").alias("n_nodes"))
        .crossJoin(pairs.agg(F.count("*").alias("n_edges")))
        .crossJoin(tri)
    )
    return summary.select("n_nodes", "n_edges", "n_triangles")


def _z16_terms(xbits: str, ybits: str) -> str:
    """Morton/Z-order interleave of two 16-bit values as a plain integer
    expression — identical text works in Spark SQL and DuckDB (both use
    >> << & | on BIGINT). x occupies even bits, y odd bits; the terms are
    bit-disjoint so | is exact."""
    terms = []
    for i in range(16):
        terms.append(f"(((({xbits}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({ybits}) >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_Z_SPARK = _z16_terms(
    "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1995-01-01') AS BIGINT)",
    "CAST(o_custkey AS BIGINT) & 65535",
)
_Z_DUCK = _z16_terms(
    "CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) "
    "AS BIGINT)",
    "CAST(o_custkey AS BIGINT) & 65535",
)


@query(
    "zorder_key_orders",
    oracle=f"""
    SELECT o_orderkey, CAST({_Z_DUCK} AS BIGINT) AS zkey
    FROM orders
    """,
)
def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (order day, custkey): the
    multi-dimensional data-layout primitive behind Delta/Iceberg OPTIMIZE
    ZORDER. Sorting the table by this key before writing makes parquet
    row-group min/max spans tight in BOTH dimensions at once, so a
    100 TB scan with a (customer, date-range) predicate skips most files
    — single-column sort gives skipping on one dimension only
    (test_scale_patterns pins the locality property). Pure bit
    arithmetic at scan speed; the identical expression text runs on both
    engines, so the oracle is the same formula, not a reimplementation."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", F.expr(f"CAST({_Z_SPARK} AS BIGINT)").alias("zkey")
    )


@query(
    "event_pattern_funnel_regex",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(CASE event_type WHEN 'signup' THEN 's'
                                          WHEN 'click' THEN 'c'
                                          WHEN 'purchase' THEN 'p'
                                          WHEN 'view' THEN 'v'
                                          ELSE 'e' END,
                          '' ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(seq, 'sc+p')) AS BIGINT) AS n_matches,
           CAST(len(seq) AS BIGINT) AS n_events
    FROM seqs
    """,
)
def event_pattern_funnel_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching: per user, count
    contiguous signup→click+→purchase runs in the time-ordered event
    stream, compiled to a regex over a single-char encoding of the
    sequence (the classic sequence-mining trick — the event alphabet is
    tiny, so the per-user sequence is a string and the pattern engine
    does the automaton work JVM-side). One shuffle to assemble per-user
    sequences; non-overlapping leftmost matching is identical in Java
    regex and RE2 for this alphabet-disjoint pattern. Per-user state is
    bounded by user activity; an unbounded stream would segment by
    session/day first (sessionize_events) — documented, not needed at
    fixture activity levels."""
    ev = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "view", "v")
        .otherwise("e")
    )
    seqs = (
        ev.select("user_id", "ts", "event_id", code.alias("code"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "code"))
                    ),
                    lambda x: x["code"],
                ),
                "",
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.regexp_count("seq", F.lit("sc+p")).cast("long").alias("n_matches"),
        F.length("seq").cast("long").alias("n_events"),
    )


@query(
    "timeweighted_avg_value_per_user",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(ROUND(value * 1000) AS BIGINT) AS value_mil,
               epoch_ms(ts) AS t_ms,
               epoch_ms(LEAD(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS next_ms
        FROM events
    ), g AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               SUM(value_mil * (next_ms - t_ms)) AS num,
               SUM(next_ms - t_ms) AS den
        FROM e GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(den AS BIGINT) AS span_ms,
           -- trunc-toward-zero division, matching Spark's `div` (DuckDB
           -- `//` floors, which diverges when num < 0)
           CAST(CASE WHEN num >= 0 THEN num // den
                     ELSE -((-num) // den) END AS BIGINT) AS twa_mil
    FROM g WHERE den > 0
    """,
)
def timeweighted_avg_value_per_user(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Time-weighted average (the timescale/metrics-store operator plain
    AVG gets wrong): each observation is weighted by how long it was the
    live value — duration to the next event — so sparse-but-long-lived
    readings dominate bursts. Integer arithmetic throughout (millivalue ×
    millisecond weights; worst case ~2^50 per user, no overflow), making
    the association-order-free sums bit-identical across engines and
    partitionings; the final quotient truncates toward zero on BOTH
    engines (Spark `div` truncates; the oracle wraps DuckDB's flooring
    `//` in a sign split), so negative weighted sums agree too. One
    shuffle: the lead() window and the aggregate share the user_id
    partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id",
        F.round(F.col("value") * 1000).cast("long").alias("value_mil"),
        F.unix_millis("ts").alias("t_ms"),
        F.unix_millis(F.lead("ts").over(w)).alias("next_ms"),
    )
    g = e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value_mil") * (F.col("next_ms") - F.col("t_ms")))
         .alias("num"),
        F.sum(F.col("next_ms") - F.col("t_ms")).alias("den"),
    )
    return g.filter(F.col("den") > 0).select(
        "user_id", "n_events",
        F.col("den").alias("span_ms"),
        F.expr("num div den").alias("twa_mil"),
    )


@query(
    "gapfill_user_daily_values",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS day_cents
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS min_day,
               MAX(CAST(ts AS DATE)) AS max_day
        FROM events
    ), grid AS (
        SELECT u.user_id,
               CAST(UNNEST(generate_series(b.min_day, b.max_day,
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM (SELECT DISTINCT user_id FROM daily) u CROSS JOIN bounds b
    )
    SELECT g.user_id,
           strftime(g.day, '%Y-%m-%d') AS day,
           CAST(d.day_cents AS BIGINT) AS day_cents,
           CAST(LAST_VALUE(d.day_cents IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS filled_cents
    FROM grid g
    LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def gapfill_user_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeseries gap-fill + forward-fill (LOCF): a dense per-user daily
    grid over the corpus's global date span, daily sums joined on, gaps
    carried forward with last(ignorenulls). The grid bounds are a 1-row
    aggregate broadcast over the distinct-user list (scalar-subquery
    class); the explode is bounded by span_days per user, so the output
    is |users| × span — a deliberate densification, never a blind cross
    of two facts. The forward-fill window shares the join's user_id
    partitioning. This is the shape metrics stores call gap-filling /
    interpolation; at 100 TB span and users both stay bounded per key."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("day_cents"))
    bounds = ev.agg(F.min(F.to_date("ts")).alias("min_day"),
                    F.max(F.to_date("ts")).alias("max_day"))
    users = daily.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(F.sequence("min_day", "max_day")).alias("day"),
    )
    filled = grid.join(daily, ["user_id", "day"], "left")
    wff = (
        W.partitionBy("user_id").orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return filled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "day_cents",
        F.last("day_cents", ignorenulls=True).over(wff).alias("filled_cents"),
    )


@query(
    "graph_bfs_3hop",
    oracle="""
    WITH RECURSIVE e AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), walk(kind, id, dist) AS (
        SELECT 'C', CAST(1 AS BIGINT), 0
        UNION
        SELECT CASE WHEN w.kind = 'C' THEN 'S' ELSE 'C' END,
               CASE WHEN w.kind = 'C' THEN e.s ELSE e.c END,
               w.dist + 1
        FROM walk w JOIN e ON (w.kind = 'C' AND e.c = w.id)
                           OR (w.kind = 'S' AND e.s = w.id)
        WHERE w.dist < 3
    )
    SELECT kind, id, CAST(MIN(dist) AS BIGINT) AS dist
    FROM walk GROUP BY kind, id
    """,
)
def graph_bfs_3hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop BFS reachability (k=3) from customer 1 over the bipartite
    customer—supplier purchase graph: the frontier-expansion loop every
    distributed graph engine runs. Each hop is ONE keyed join of the
    (small) frontier against the edge list plus an anti-join against the
    visited set — never a transitive-closure blowup; the frontier is
    broadcast-size by construction and layers guarantee minimal
    distances, matching the oracle's recursive-CTE MIN(dist). At 100 TB
    the edge list shuffles once (partitioned by join side) and each
    iteration reuses it; the loop unrolls in the driver exactly like
    pagerank_loop (operators/graph.py)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        # materialize ONCE: the unrolled loop references edges twice per
        # hop, and without truncation each reference re-executes the
        # lineitem⋈orders build (same convention as pagerank_loop /
        # kmeans_train in operators/graph.py)
        .localCheckpoint(eager=True)
    )
    seed = inline_dim(spark, [("C", 1, 0)], "kind string, id long, dist long")
    visited, frontier = seed, seed
    for step in range(1, 4):
        from_c = frontier.filter(F.col("kind") == "C").join(
            edges, F.col("id") == F.col("c")
        ).select(F.lit("S").alias("kind"), F.col("s").alias("id"),
                 F.lit(step).cast("long").alias("dist"))
        from_s = frontier.filter(F.col("kind") == "S").join(
            edges, F.col("id") == F.col("s")
        ).select(F.lit("C").alias("kind"), F.col("c").alias("id"),
                 F.lit(step).cast("long").alias("dist"))
        expanded = from_c.unionByName(from_s).distinct()
        # truncate lineage per hop: otherwise frontier/visited nest the
        # previous hops' joins three deep in the final plan
        frontier = expanded.join(visited, ["kind", "id"], "left_anti") \
            .localCheckpoint(eager=True)
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    return visited


@query(
    "winsorized_value_stats",
    oracle="""
    WITH q AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), c AS (
        SELECT event_type, cents, COUNT(*) AS n FROM q GROUP BY ALL
    ), t AS (
        SELECT event_type, cents,
               SUM(n) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
               SUM(n) OVER (PARTITION BY event_type) AS tot
        FROM c
    ), p AS (
        SELECT event_type,
               MIN(CASE WHEN cum * 20 >= tot THEN cents END) AS p05,
               MIN(CASE WHEN cum * 20 >= 19 * tot THEN cents END) AS p95
        FROM t GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(LEAST(GREATEST(e.cents, p.p05), p.p95)) AS BIGINT)
               AS winsorized_cents,
           CAST(SUM(CASE WHEN e.cents < p.p05 OR e.cents > p.p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM q e JOIN p USING (event_type)
    GROUP BY e.event_type
    """,
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the robust-statistics cleaning step (clip to the
    per-group [p05, p95] band) that keeps a hot sensor or a fat-finger
    payment from dominating a mean. The band comes from the CENT-GRID
    discrete percentile (operators/sketches.py:histogram_percentiles —
    smallest cent whose cumulative count reaches ceil(q·n); pure
    integer rank arithmetic), NOT a linearly-interpolated float
    percentile: interpolation is only ulp-stable across engines until
    the rank lands on a tied value, at which point a one-ulp band
    difference flips the clip for every copy of that value — found by
    the ×10 replicated-fixture differential (BENCH_DIFF §scaling) where
    every value has 10 copies, and fixed by making the band integer.
    Shape: per-type cent histogram (map-side combinable) → tiny band
    table broadcast back onto the stream, clip at scan speed,
    integer-cent sums — association-order-free at any scale."""
    from ..operators.sketches import histogram_percentiles

    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    p = histogram_percentiles(
        ev, ["event_type"], "value",
        [("p05", 1, 20), ("p95", 19, 20)], scale=100,
    )
    clipped = q.join(F.broadcast(p), "event_type").withColumn(
        "w", F.least(F.greatest(F.col("cents"), F.col("p05")), F.col("p95"))
    )
    return clipped.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("w").alias("winsorized_cents"),
        F.sum(F.when((F.col("cents") < F.col("p05"))
                     | (F.col("cents") > F.col("p95")), 1).otherwise(0))
         .cast("long").alias("n_clipped"),
    )


from ..operators.sketches import mad_stats, mad_stats_oracle_sql  # noqa: E402


@query(
    "mad_outlier_value_stats",
    oracle=mad_stats_oracle_sql("events", "event_type", "value", k=5),
)
def mad_outlier_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier gate: per-event-type cent-grid median, MAD
    (median absolute deviation), and the count of rows beyond 5 MADs —
    the breakdown-point-0.5 companion to the mean/stddev 3-sigma gate
    (relational4.py:events_value_outliers), which a single hot sensor can drag
    past any threshold while the median+MAD ignore up to half the data
    being corrupt. All integer arithmetic on the cent grid
    (operators/sketches.py:mad_stats): two raw scans, every shuffle
    O(distinct cents per type) — the oracle is the transcription of the
    same integer rank rule, not a float approximation."""
    ev = load_table(spark, sf_dir, "events")
    return mad_stats(ev, ["event_type"], "value", k=5)


@query(
    "ema_daily_value_halflife",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day_num,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS day_cents
        FROM events GROUP BY 1, 2
    ), j AS (
        SELECT a.event_type, a.day_num, a.day_cents,
               b.day_cents *
               (CAST(1 AS BIGINT) << (19 - CAST(a.day_num - b.day_num
                                                AS INTEGER))) AS term
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type
         AND b.day_num BETWEEN a.day_num - 19 AND a.day_num
    )
    SELECT event_type,
           strftime(DATE '1970-01-01' + CAST(day_num AS INTEGER),
                    '%Y-%m-%d') AS day,
           day_cents,
           CAST(SUM(term) AS BIGINT) AS ema_scaled,
           CAST(SUM(term) AS BIGINT) / 1048576.0 AS ema_cents
    FROM j GROUP BY 1, 2, 3
    """,
)
def ema_daily_value_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average with a one-day half-life — the
    trend-smoothing verb (monitoring dashboards, spend forecasting)
    that naive implementations make order-dependent float recursions.
    The textbook α=1/2 recursion
    ema_t = v_t/2 + ema_{t−1}/2 has weight 2^-(g+1) at lag g — every
    weight a DYADIC rational — so the engine computes
    scaled = Σ day_cents·2^(19−g) in BIGINT (exact) and the final
    ema = scaled / 2^20 is one IEEE division (correctly rounded, hence
    bit-identical on every engine). Decay is by CALENDAR day
    (gap-aware: a silent day simply contributes no term), the window
    truncates at 20 lags where weights < 2^-19 of the leading term.

    Scale shape: the raw scan collapses to the per-(type, day) daily
    table FIRST (one shuffle with map-side combine, output rows =
    types × days — tiny at any SF), and the 20-lag decayed sum is a
    broadcast self-join on that pre-aggregate, never on raw events.
    The overflow bound: day_cents < 2^43 keeps every term < 2^62."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.col("ts").cast("date"),
                       F.lit("1970-01-01").cast("date")).alias("day_num"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day_num")
        .agg(F.sum("cents").alias("day_cents"))
    )
    j = (
        daily.alias("a")
        .join(
            F.broadcast(daily.alias("b")),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.day_num") <= F.col("a.day_num"))
            & (F.col("b.day_num") >= F.col("a.day_num") - 19),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day_num").alias("day_num"),
            F.col("a.day_cents").alias("day_cents"),
            (F.col("b.day_cents")
             * F.expr("shiftleft(CAST(1 AS BIGINT), "
                      "CAST(19 - (a.day_num - b.day_num) AS INT))")
             ).alias("term"),
        )
    )
    return (
        j.groupBy("event_type", "day_num", "day_cents")
        .agg(F.sum("term").alias("ema_scaled"))
        .select(
            "event_type",
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"),
                           F.col("day_num")),
                "yyyy-MM-dd").alias("day"),
            "day_cents",
            "ema_scaled",
            (F.col("ema_scaled") / F.lit(1048576.0)).alias("ema_cents"),
        )
    )
