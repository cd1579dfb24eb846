"""Sixth batch: decision-support verbs past the report surface —
multi-criteria Pareto frontier (skyline), exact-sum largest-remainder
budget allocation, distribution-drift monitoring (PSI over fixed bins),
and sweep-line peak concurrency over sessions.

Same contract as every batch: integer/cent-grid arithmetic wherever a
value feeds a comparison (SCALING.md numeric policy), shuffles keyed on
the natural grouping, and the DuckDB oracle a transcription of the same
algorithm, not an independent approximation. The reference ranks by
single measures and never reconciles parts to wholes (reference
top10.py:137-278, royalties.py:232-317); these are the verbs that
workload grows into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators.allocate import (allocate_proportional,
                                  allocate_proportional_oracle_sql)
from ..operators.pareto import pareto_frontier, pareto_frontier_oracle_sql
from ..operators.sweep import (interval_concurrency,
                               interval_concurrency_oracle_sql)
from ..sources import load_table
from ..sources.readers import inline_dim
from .registry import query

_EPOCH = "1970-01-01"


# ---------------------------------------------------------------------------
# Pareto frontier (skyline): undominated (price, recency) orders per
# priority class — the O(n log n) window form, not the O(n²) NOT EXISTS.
# ---------------------------------------------------------------------------
_PARETO_INNER = f"""(
    SELECT o_orderpriority, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
           CAST(date_diff('day', DATE '{_EPOCH}',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num
    FROM orders
)"""


@query(
    "pareto_front_orders_price_recency",
    oracle=pareto_frontier_oracle_sql(
        _PARETO_INNER, "price_cents", "day_num", keys="o_orderpriority",
        select="o_orderpriority, o_orderkey, price_cents, day_num"),
)
def pareto_front_orders_price_recency(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Skyline per priority class: orders no other same-priority order
    beats on BOTH total price and recency — the multi-criteria "best
    candidates" verb (compare topk_parts_per_brand, which ranks on one
    measure). operators/pareto.py: two RANGE-framed running-max windows
    after one sort — one shuffle on the priority key, no self-join, and
    the RANGE frame keys dominance on the cent VALUE, so the result is
    identical under any physical row order."""
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        "o_orderpriority", "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long")
         .alias("price_cents"),
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit(_EPOCH).cast("date")).cast("long")
         .alias("day_num"),
    )
    return pareto_frontier(pts, "price_cents", "day_num",
                           keys=["o_orderpriority"])


# ---------------------------------------------------------------------------
# Largest-remainder allocation: a 1M-unit budget per region split across
# its nations proportional to revenue — integers that SUM EXACTLY.
# ---------------------------------------------------------------------------
_ALLOC_INNER = """
    SELECT r_name AS region, n_name AS nation,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
"""


@query(
    "allocate_budget_by_nation_revenue",
    oracle=allocate_proportional_oracle_sql(
        _ALLOC_INNER, "region", "nation", "revenue_cents", 1_000_000,
        select="region, nation, revenue_cents"),
)
def allocate_budget_by_nation_revenue(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Hamilton (largest-remainder) apportionment: 1,000,000 budget
    units per region, split across its nations proportional to order
    revenue, with SUM(alloc_units) == 1,000,000 exactly per region
    (pinned in tests — naive float rounding drifts by units and the
    drift direction is engine-dependent). operators/allocate.py: floor
    + remainder in BIGINT, leftovers to the largest remainders, nation
    name breaking ties. One fact shuffle to build the weights (nation
    and region broadcast), then windows over the 5-row regions."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    weights = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"),
                 F.col("n_name").alias("nation"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
              .cast("long").alias("revenue_cents"))
    )
    return allocate_proportional(weights, ["region"], "nation",
                                 "revenue_cents", 1_000_000)


# ---------------------------------------------------------------------------
# Distribution drift: PSI of the value distribution, even vs odd days,
# per event type — fixed cent-grid bins, Laplace-smoothed.
# ---------------------------------------------------------------------------
_PSI_EDGES = [500, 1000, 2500, 5000, 10000, 20000]


def _psi_side_sql(parity: int) -> str:
    cases = " ".join(
        f"WHEN c >= {e} THEN {i + 1}"
        for i, e in reversed(list(enumerate(_PSI_EDGES))))
    return f"""
        SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT event_type,
                   CASE {cases} ELSE 0 END AS bin
            FROM (
                SELECT event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS c,
                       date_diff('day', DATE '{_EPOCH}',
                                 CAST(ts AS DATE)) AS day_num
                FROM events
            ) WHERE day_num % 2 = {parity}
        ) GROUP BY 1, 2
    """


@query(
    "value_drift_psi_by_type",
    oracle=f"""
    WITH a AS ({_psi_side_sql(0)}), b AS ({_psi_side_sql(1)}),
    m AS (
        SELECT COALESCE(a.event_type, b.event_type) AS event_type,
               COALESCE(a.n, 0) AS n_a, COALESCE(b.n, 0) AS n_b
        FROM a FULL OUTER JOIN b
          ON a.event_type = b.event_type AND a.bin = b.bin
    ), tot AS (
        SELECT event_type, SUM(n_a) AS tot_a, SUM(n_b) AS tot_b
        FROM m GROUP BY 1
    )
    SELECT m.event_type,
           CAST(MAX(tot_a) AS BIGINT) AS n_a,
           CAST(MAX(tot_b) AS BIGINT) AS n_b,
           ROUND(SUM(
               (((n_a + 1) / CAST(tot_a + {len(_PSI_EDGES) + 1} AS DOUBLE))
                - ((n_b + 1) / CAST(tot_b + {len(_PSI_EDGES) + 1} AS DOUBLE)))
               * ln(((n_a + 1) / CAST(tot_a + {len(_PSI_EDGES) + 1} AS DOUBLE))
                    / ((n_b + 1) / CAST(tot_b + {len(_PSI_EDGES) + 1} AS DOUBLE)))
           ), 6) AS psi
    FROM m JOIN tot ON m.event_type = tot.event_type
    GROUP BY 1
    """,
)
def value_drift_psi_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution,
    even- vs odd-numbered days, per event type — the feature-drift gate
    a training pipeline runs before each refresh. operators/drift.py:
    FIXED cent-grid bin edges (never data-derived quantiles — the
    winsorize lesson), exact smoothed integer counts, one tiny
    (type × 7 bins) merge; the sole float steps are the final
    divisions and ln(), rounded to 6 digits on both engines. On this
    stationary fixture the PSI correctly reads ≈0 — the gate verifies
    the arithmetic, not a synthetic drift."""
    from ..operators.drift import psi_drift

    ev = load_table(spark, sf_dir, "events")
    day_num = F.datediff(F.col("ts").cast("date"),
                         F.lit(_EPOCH).cast("date"))
    even = ev.filter(day_num % 2 == 0)
    odd = ev.filter(day_num % 2 == 1)
    return psi_drift(even, odd, ["event_type"], "value", _PSI_EDGES)


# ---------------------------------------------------------------------------
# Sweep-line peak concurrency: max concurrent 30-min-gap sessions per
# day, midnight probes carrying boundary-spanning sessions in.
# ---------------------------------------------------------------------------
_SESSIONS_SQL = """
    SELECT user_id, MIN(sec) AS start_sec, MAX(sec) AS end_sec
    FROM (
        SELECT user_id, sec,
               SUM(CASE WHEN prev IS NULL OR sec - prev > 1800
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY sec, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM (
            SELECT user_id, event_id, epoch_ms(ts) // 1000 AS sec,
                   LAG(epoch_ms(ts) // 1000) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        )
    ) GROUP BY user_id, session_id
"""

_PROBES_SQL = f"""
    SELECT DISTINCT CAST(date_diff('day', DATE '{_EPOCH}',
                                   CAST(ts AS DATE)) AS BIGINT) * 86400
               AS sec
    FROM events
"""


@query(
    "peak_concurrent_sessions_daily",
    oracle=f"""
    WITH conc AS ({interval_concurrency_oracle_sql(
        _SESSIONS_SQL, "start_sec", "end_sec", probes=_PROBES_SQL)})
    SELECT strftime(DATE '{_EPOCH}'
                    + CAST(sec // 86400 AS INTEGER), '%Y-%m-%d') AS day,
           CAST(MAX(conc) AS BIGINT) AS peak
    FROM conc GROUP BY 1
    """,
)
def peak_concurrent_sessions_daily(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Capacity-planning verb: the daily PEAK number of simultaneously
    open 30-min-gap sessions (same session definition as
    sessionize_events), via operators/sweep.py's O(n log n) sweep
    instead of an interval self-join. Delta-0 probes injected at each
    midnight read the carry-in concurrency, so a session spanning the
    boundary counts toward both days even when neither day contains one
    of its endpoints. All arithmetic on the integer second grid
    (epoch-ms floor-div 1000 on both engines)."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.unix_millis(F.col("ts")) / 1000).cast("long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(sec).over(w)
    flagged = ev.select(
        "user_id", sec.alias("sec"),
        F.when(prev.isNull() | ((sec - prev) > 1800), 1).otherwise(0)
         .alias("new_session"),
        F.sum(F.when(prev.isNull() | ((sec - prev) > 1800), 1).otherwise(0))
         .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
         .alias("session_id"),
    )
    sessions = (flagged.groupBy("user_id", "session_id")
                .agg(F.min("sec").alias("start_sec"),
                     F.max("sec").alias("end_sec")))
    probes = (
        ev.select((F.datediff(F.col("ts").cast("date"),
                              F.lit(_EPOCH).cast("date")).cast("long")
                   * 86400).alias("sec"))
        .distinct()
    )
    conc = interval_concurrency(sessions, "start_sec", "end_sec",
                                probes=probes)
    return (
        conc.groupBy(F.date_format(
            F.date_add(F.lit(_EPOCH).cast("date"),
                       F.floor(F.col("sec") / 86400).cast("int")),
            "yyyy-MM-dd").alias("day"))
        .agg(F.max("conc").cast("long").alias("peak"))
    )


# ---------------------------------------------------------------------------
# Exact-rational OLS trend: daily revenue slope per event type.
# ---------------------------------------------------------------------------
from ..operators.stats import (gini, gini_oracle_sql, trend_slope,  # noqa: E402
                               trend_slope_oracle_sql)

_DAILY_CENTS_SQL = f"""
    SELECT event_type,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
"""


@query(
    "trend_slope_daily_revenue_by_type",
    oracle=trend_slope_oracle_sql(_DAILY_CENTS_SQL, "event_type", "x", "y"),
)
def trend_slope_daily_revenue_by_type(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Direction verb: OLS slope/intercept of daily revenue (cents) per
    event type — growing or shrinking, in cents/day.
    operators/stats.py:trend_slope computes the four moments as EXACT
    BIGINTs over the per-(type, day) pre-aggregate (x centered on the
    fixed date 2024-01-01 to keep Σx² tiny), so each output is one
    correctly-rounded IEEE division — unlike regr_slope()/covar_samp(),
    whose float accumulation order varies with partitioning. Raw events
    collapse in one map-side-combinable shuffle; the moment pass runs on
    types × days rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.col("ts").cast("date"),
                       F.lit("2024-01-01").cast("date")).alias("x"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "x")
        .agg(F.sum("cents").alias("y"))
    )
    return trend_slope(daily, ["event_type"], "x", "y")


# ---------------------------------------------------------------------------
# Gini concentration: how unequal is customer revenue within a region.
# ---------------------------------------------------------------------------
_CUST_REVENUE_SQL = """
    SELECT r_name AS region, c_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
"""


@query(
    "gini_revenue_concentration_by_region",
    oracle=gini_oracle_sql(_CUST_REVENUE_SQL, "region",
                           "revenue_cents", "c_custkey"),
)
def gini_revenue_concentration_by_region(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    """Concentration verb: the Gini coefficient of per-customer order
    revenue within each region (customers WITH orders; a zero-revenue
    customer would need a left join — deliberate, documented scope).
    operators/stats.py:gini — rank-weighted exact BIGINT sums, one
    shuffle shared by the rank window and the grouped moments, one
    final IEEE division. Tied revenues are order-free in the numerator,
    so the custkey tie-break affects determinism of nothing."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), "c_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
              .cast("long").alias("revenue_cents"))
    )
    return gini(rev, ["region"], "revenue_cents", "c_custkey")


# ---------------------------------------------------------------------------
# Exact two-sample KS distance: the binning-free companion to PSI.
# ---------------------------------------------------------------------------
from ..operators.drift import ks_distance, ks_distance_oracle_sql  # noqa: E402


def _day_slice_sql(parity: int) -> str:
    return f"""
        SELECT event_type, value FROM (
            SELECT event_type, value,
                   date_diff('day', DATE '{_EPOCH}',
                             CAST(ts AS DATE)) AS day_num
            FROM events
        ) WHERE day_num % 2 = {parity}
    """


@query(
    "value_ks_distance_by_type",
    oracle=ks_distance_oracle_sql(_day_slice_sql(0), _day_slice_sql(1),
                                  "event_type", "value"),
)
def value_ks_distance_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance of the value distribution,
    even- vs odd-numbered days, per event type — PSI's nonparametric
    companion with NO binning choice and NO float accumulation:
    operators/drift.py:ks_distance cross-multiplies the integer ECDFs
    (|cum_a·tot_b − cum_b·tot_a| in BIGINT, max'd exactly), and the
    single float step is the final division — bit-identical on any
    engine, at any partitioning, with zero rounding needed."""
    ev = load_table(spark, sf_dir, "events")
    day_num = F.datediff(F.col("ts").cast("date"),
                         F.lit(_EPOCH).cast("date"))
    even = ev.filter(day_num % 2 == 0)
    odd = ev.filter(day_num % 2 == 1)
    return ks_distance(even, odd, ["event_type"], "value")


# ---------------------------------------------------------------------------
# Benford first-digit audit: 100% integer output (counts + ppm shares).
# ---------------------------------------------------------------------------
from ..operators.stats import (benford_digit_stats,  # noqa: E402
                               benford_digit_stats_oracle_sql)


@query(
    "benford_first_digit_order_prices",
    oracle=benford_digit_stats_oracle_sql(
        "SELECT o_orderpriority, o_totalprice FROM orders",
        "o_orderpriority", "o_totalprice"),
)
def benford_first_digit_order_prices(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Data-authenticity screen: the first-significant-digit
    distribution of order prices per priority class vs Benford's law
    (fabricated or unit-corrupted monetary data drifts from
    log10(1+1/d)). operators/stats.py:benford_digit_stats — one
    9-rows-per-key shuffle, shares as FLOOR-divided integer ppm and the
    Benford expectation as fixed integer ppm constants, so the whole
    query is float-free end to end."""
    orders = load_table(spark, sf_dir, "orders")
    return benford_digit_stats(orders.select("o_orderpriority",
                                             "o_totalprice"),
                               ["o_orderpriority"], "o_totalprice")


# ---------------------------------------------------------------------------
# Composition gates: existing verbs chained into new reports — proving
# the operators compose (sessionize → duration percentiles; funnel →
# conversion-latency percentiles), not just run alone.
# ---------------------------------------------------------------------------
from ..operators.sketches import (histogram_percentiles,  # noqa: E402
                                  histogram_percentiles_oracle_sql)

_DURATION_SPECS = [("p50", 1, 2), ("p90", 9, 10), ("p95", 19, 20)]

_SESSION_DURATIONS_SQL = f"""(
    SELECT strftime(DATE '{_EPOCH}'
                    + CAST(start_sec // 86400 AS INTEGER),
                    '%Y-%m-%d') AS day,
           end_sec - start_sec AS duration_sec
    FROM ({_SESSIONS_SQL})
)"""


@query(
    "session_duration_percentiles_daily",
    oracle=histogram_percentiles_oracle_sql(
        _SESSION_DURATIONS_SQL, "day", "duration_sec",
        _DURATION_SPECS, scale=1),
)
def session_duration_percentiles_daily(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Composition: sessionize_events' lag/gap sessions piped into the
    mergeable histogram-percentile sketch — p50/p90/p95 session length
    (seconds) per start day. scale=1 puts the histogram directly on the
    integer second grid; both stages keep the integer rank rule, so the
    whole chain is a transcription for DuckDB. One shuffle to
    sessionize (user key), one to histogram (day, second) — never a
    full sort."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.unix_millis(F.col("ts")) / 1000).cast("long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(sec).over(w)
    flag = F.when(prev.isNull() | ((sec - prev) > 1800), 1).otherwise(0)
    sessions = (
        ev.select(
            "user_id", sec.alias("sec"),
            F.sum(flag).over(w.rowsBetween(W.unboundedPreceding,
                                           W.currentRow))
             .alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(F.min("sec").alias("start_sec"), F.max("sec").alias("end_sec"))
    )
    durations = sessions.select(
        F.date_format(
            F.date_add(F.lit(_EPOCH).cast("date"),
                       F.floor(F.col("start_sec") / 86400).cast("int")),
            "yyyy-MM-dd").alias("day"),
        (F.col("end_sec") - F.col("start_sec")).alias("duration_sec"),
    )
    return histogram_percentiles(durations, ["day"], "duration_sec",
                                 _DURATION_SPECS, scale=1)


_CONVERSION_SQL = f"""(
    SELECT strftime(DATE '{_EPOCH}'
                    + CAST(fs // 86400 AS INTEGER), '%Y-%m-%d')
               AS cohort_day,
           fp - fs AS latency_sec
    FROM (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN sec END) AS fs,
               MIN(CASE WHEN event_type = 'purchase' AND sec >= _fs
                        THEN sec END) AS fp
        FROM (
            SELECT user_id, event_type, sec,
                   MIN(CASE WHEN event_type = 'signup' THEN sec END)
                       OVER (PARTITION BY user_id) AS _fs
            FROM (SELECT user_id, event_type,
                         epoch_ms(ts) // 1000 AS sec
                  FROM events)
        )
        GROUP BY user_id
    ) WHERE fs IS NOT NULL AND fp IS NOT NULL
)"""


@query(
    "conversion_latency_percentiles_by_cohort",
    oracle=histogram_percentiles_oracle_sql(
        _CONVERSION_SQL, "cohort_day", "latency_sec",
        _DURATION_SPECS, scale=1),
)
def conversion_latency_percentiles_by_cohort(spark: SparkSession,
                                             sf_dir: str) -> DataFrame:
    """Composition: funnel first-signup → first-purchase-after latency
    per user, percentiled by signup-cohort day. The purchase floor
    (first signup time) attaches by a per-user window INSIDE the
    grouped aggregate — one shuffle on user_id resolves both funnel
    steps, no events×events self-join; the latency histogram then runs
    on the tiny (cohort, seconds) table. Integer seconds end to end."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.unix_millis(F.col("ts")) / 1000).cast("long")
    fs_w = F.min(F.when(F.col("event_type") == "signup", F.col("sec"))) \
            .over(W.partitionBy("user_id"))
    per_user = (
        ev.select("user_id", "event_type", sec.alias("sec"))
        .withColumn("_fs", fs_w)
        .groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "signup",
                          F.col("sec"))).alias("fs"),
             F.min(F.when((F.col("event_type") == "purchase")
                          & (F.col("sec") >= F.col("_fs")),
                          F.col("sec"))).alias("fp"))
        .filter(F.col("fs").isNotNull() & F.col("fp").isNotNull())
    )
    lat = per_user.select(
        F.date_format(
            F.date_add(F.lit(_EPOCH).cast("date"),
                       F.floor(F.col("fs") / 86400).cast("int")),
            "yyyy-MM-dd").alias("cohort_day"),
        (F.col("fp") - F.col("fs")).alias("latency_sec"),
    )
    return histogram_percentiles(lat, ["cohort_day"], "latency_sec",
                                 _DURATION_SPECS, scale=1)


_FEATURE_CUTOFFS = ["2024-01-08", "2024-01-15", "2024-01-22", "2024-01-29"]


@query(
    "feature_snapshot_user_weekly",
    oracle=f"""
    WITH cutoffs(cutoff) AS (
        VALUES {", ".join(f"('{c}')" for c in _FEATURE_CUTOFFS)}
    ), per_day AS (
        SELECT user_id, event_type,
               strftime(ts, '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2, 3
    )
    SELECT c.cutoff, p.user_id,
           CAST(SUM(p.n) AS BIGINT) AS n_events_7d,
           CAST(SUM(p.cents) AS BIGINT) AS value_cents_7d,
           CAST(COUNT(DISTINCT p.day) AS BIGINT) AS active_days_7d,
           CAST(COUNT(DISTINCT p.event_type) AS BIGINT) AS types_7d
    FROM per_day p
    JOIN cutoffs c
      ON p.day < c.cutoff
     AND p.day >= strftime(CAST(c.cutoff AS DATE) - INTERVAL 7 DAY,
                           '%Y-%m-%d')
    GROUP BY 1, 2
    """,
)
def feature_snapshot_user_weekly(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Point-in-time training-feature matrix — the feature-store verb a
    model-training pipeline runs to build leakage-free examples: for
    each weekly cutoff, every user's trailing-7-day activity STRICTLY
    BEFORE the cutoff (events ON the cutoff day are excluded — they are
    the label window's business). One (user, type, day) pre-aggregate
    shrinks the fact to at most users×types×days rows BEFORE the
    4-row cutoff dim broadcast-joins in (so the range join never touches
    raw events — the shape that survives a 100 TB event store), then one
    grouped pass per (cutoff, user). All features integer-exact."""
    ev = load_table(spark, sf_dir, "events")
    per_day = (
        ev.select(
            "user_id", "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("user_id", "event_type", "day")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("cents_sum"))
    )
    cutoffs = F.broadcast(
        inline_dim(spark, [(c,) for c in _FEATURE_CUTOFFS], "cutoff string")
        .withColumn(
            "win_start",
            F.date_format(
                F.date_sub(F.col("cutoff").cast("date"), 7), "yyyy-MM-dd"
            ),
        )
    )
    return (
        per_day.join(
            cutoffs,
            (F.col("day") < F.col("cutoff"))
            & (F.col("day") >= F.col("win_start")),
        )
        .groupBy("cutoff", "user_id")
        .agg(
            F.sum("n").alias("n_events_7d"),
            F.sum("cents_sum").alias("value_cents_7d"),
            F.countDistinct("day").alias("active_days_7d"),
            F.countDistinct("event_type").alias("types_7d"),
        )
    )


_MTA_WINDOW_DAYS = 2
_MTA_TOTAL_PPM = 1_000_000


def _mta_oracle() -> str:
    inner = f"""
        SELECT p.event_id AS purchase_id,
               c.event_id AS click_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY p.event_id ORDER BY c.ts, c.event_id)
                   AS BIGINT) AS pos,
               COUNT(*) OVER (PARTITION BY p.event_id) AS n_clicks
        FROM events p JOIN events c
          ON p.user_id = c.user_id
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.ts <= p.ts
          AND c.ts >= p.ts - INTERVAL {_MTA_WINDOW_DAYS} DAY
    """
    weighted = f"""
        SELECT purchase_id, click_id, pos,
               CAST(CASE WHEN pos = 1 OR pos = n_clicks THEN 2 ELSE 1 END
                    AS BIGINT) AS w
        FROM ({inner})
    """
    return allocate_proportional_oracle_sql(
        weighted, keys="purchase_id", id_col="pos", weight_col="w",
        total=_MTA_TOTAL_PPM,
        select="purchase_id, click_id, CAST(pos AS BIGINT) AS pos",
        out_col="credit_ppm",
    )


@query("multitouch_attribution_credit", oracle=_mta_oracle())
def multitouch_attribution_credit(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Position-weighted multi-touch attribution with EXACT
    reconciliation — the marketing verb naive float weighting gets
    wrong: each purchase's credit must sum to exactly 1,000,000 ppm
    across its attributed clicks (finance reconciles the parts to the
    whole; 999,999 is a ledger break). U-shaped weights (first touch 2,
    last touch 2, middles 1 — so a lone click takes 100%, a pair splits
    50/50) feed the Hamilton allocator (operators/allocate.py), whose
    per-group exact-sum invariant is already pinned; ties break on
    click position, so credits are engine- and partitioning-invariant.

    Plan shape: the attribution pairs come from the same broadcastable
    purchase↔click range join the streaming gate drains; position and
    count are two expressions over ONE purchase-keyed window pass; the
    allocator adds windows on the same key — no extra shuffle after the
    pair join."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    pairs = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts")
           >= F.col("p_ts") - F.expr(f"INTERVAL {_MTA_WINDOW_DAYS} DAYS")),
    )
    w_pos = W.partitionBy("purchase_id").orderBy("c_ts", "click_id")
    w_all = W.partitionBy("purchase_id")
    weighted = (
        pairs.withColumn("pos", F.row_number().over(w_pos).cast("long"))
        .withColumn("n_clicks", F.count("*").over(w_all))
        .withColumn(
            "w",
            F.when(
                (F.col("pos") == 1) | (F.col("pos") == F.col("n_clicks")), 2
            ).otherwise(1).cast("long"),
        )
        .select("purchase_id", "click_id", "pos", "w")
    )
    return (
        allocate_proportional(weighted, ["purchase_id"], "pos", "w",
                              _MTA_TOTAL_PPM)
        .withColumnRenamed("alloc_units", "credit_ppm")
        .select("purchase_id", "click_id", "pos", "credit_ppm")
    )


_MTA_TOP_N = 3


def _mta_topn_oracle() -> str:
    # The oracle is the transparent (quadratic) SPEC: all window pairs,
    # keep the N most recent clicks per purchase, re-rank, U-weight,
    # allocate. The Spark side implements the same semantics with a
    # LINEAR plan — the hash match proves the rewrite.
    pairs = f"""
        SELECT p.event_id AS purchase_id,
               c.event_id AS click_id,
               c.ts AS c_ts
        FROM events p JOIN events c
          ON p.user_id = c.user_id
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.ts <= p.ts
          AND c.ts >= p.ts - INTERVAL {_MTA_WINDOW_DAYS} DAY
    """
    kept = f"""
        SELECT purchase_id, click_id, c_ts FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY purchase_id
                ORDER BY c_ts DESC, click_id DESC) AS recency
            FROM ({pairs})
        ) WHERE recency <= {_MTA_TOP_N}
    """
    weighted = f"""
        SELECT purchase_id, click_id, pos,
               CAST(CASE WHEN pos = 1 OR pos = n_clicks THEN 2 ELSE 1 END
                    AS BIGINT) AS w
        FROM (
            SELECT purchase_id, click_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY purchase_id ORDER BY c_ts, click_id)
                       AS BIGINT) AS pos,
                   COUNT(*) OVER (PARTITION BY purchase_id) AS n_clicks
            FROM ({kept})
        )
    """
    return allocate_proportional_oracle_sql(
        weighted, keys="purchase_id", id_col="pos", weight_col="w",
        total=_MTA_TOTAL_PPM,
        select="purchase_id, click_id, CAST(pos AS BIGINT) AS pos",
        out_col="credit_ppm",
    )


@query("multitouch_attribution_topn", oracle=_mta_topn_oracle())
def multitouch_attribution_topn(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Bounded multi-touch attribution — the 100 TB-safe twin of
    multitouch_attribution_credit: only the N most recent clicks inside
    the window are credited (N=_MTA_TOP_N=3), U-shaped over the kept
    set, exact-ppm Hamilton reconciliation unchanged.

    The point is the PLAN, not just the filter: the unbounded twin's
    touchpoint×purchase range join materializes every pair first (×10⁴
    intermediate rows on the ×100 co-active fixture — the measured 52×
    scaler), and a rank-filter AFTER that join would bound the output
    while still paying the quadratic middle. Here the fan-out is capped
    INSIDE the plan, linearly:

    1. one per-user window numbers the clicks (click_seq);
    2. clicks and purchases interleave into one (user, ts)-sorted
       stream where a running MAX hands each purchase the seq of its
       latest preceding click (ties: clicks sort before purchases, so
       a click AT the purchase instant counts — the c_ts <= p_ts spec);
    3. each purchase explodes at most N candidate seqs and equi-joins
       clicks on (user_id, click_seq) — never more than N rows per
       purchase exist anywhere downstream of the explode;
    4. the window's lower bound then drops candidates older than
       {_MTA_WINDOW_DAYS} days, and position/weights/allocation run on
       ≤N rows per purchase.

    Every join is an equi-join on (user_id, seq); no pair blow-up
    exists in any stage. The oracle is the quadratic spec — the hash
    match is the rewrite's proof."""
    ev = load_table(spark, sf_dir, "events")
    w_seq = W.partitionBy("user_id").orderBy("ts", "event_id")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"))
        .withColumn("click_seq",
                    F.row_number().over(
                        W.partitionBy("user_id").orderBy("c_ts", "click_id"))
                    .cast("long"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    # Interleaved stream: kind 0 = click (carries its seq), kind 1 =
    # purchase; running max of click_seq up to each purchase row is the
    # seq of its latest preceding-or-simultaneous click.
    stream = clicks.select(
        "user_id", F.col("c_ts").alias("ts"), F.lit(0).alias("kind"),
        F.col("click_id").alias("eid"), "click_seq",
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    ).unionByName(purchases.select(
        "user_id", F.col("p_ts").alias("ts"), F.lit(1).alias("kind"),
        F.col("purchase_id").alias("eid"),
        F.lit(None).cast("long").alias("click_seq"),
        "purchase_id", "p_ts",
    ))
    w_run = (W.partitionBy("user_id").orderBy("ts", "kind", "eid")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    anchored = (
        stream.withColumn("last_seq", F.max("click_seq").over(w_run))
        .filter(F.col("kind") == 1)
        .filter(F.col("last_seq") >= 1)
        .select("user_id", "purchase_id", "p_ts", "last_seq")
    )
    candidates = anchored.select(
        "user_id", "purchase_id", "p_ts",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1).cast("long"),
                           F.col("last_seq") - (_MTA_TOP_N - 1)),
                F.col("last_seq"),
            )
        ).alias("click_seq"),
    )
    kept = (
        candidates.join(clicks, ["user_id", "click_seq"])
        .filter(
            F.col("c_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {_MTA_WINDOW_DAYS} DAYS"))
    )
    w_pos = W.partitionBy("purchase_id").orderBy("c_ts", "click_id")
    w_all = W.partitionBy("purchase_id")
    weighted = (
        kept.withColumn("pos", F.row_number().over(w_pos).cast("long"))
        .withColumn("n_clicks", F.count("*").over(w_all))
        .withColumn(
            "w",
            F.when(
                (F.col("pos") == 1) | (F.col("pos") == F.col("n_clicks")), 2
            ).otherwise(1).cast("long"),
        )
        .select("purchase_id", "click_id", "pos", "w")
    )
    return (
        allocate_proportional(weighted, ["purchase_id"], "pos", "w",
                              _MTA_TOTAL_PPM)
        .withColumnRenamed("alloc_units", "credit_ppm")
        .select("purchase_id", "click_id", "pos", "credit_ppm")
    )


_KANON_K = 5


@query(
    "k_anonymous_event_release",
    oracle=f"""
    WITH q AS (
        SELECT event_type,
               strftime(ts, '%Y-%m-%d') AS day,
               CAST(user_id % 16 AS BIGINT) AS user_bucket,
               COUNT(*) OVER (PARTITION BY event_type, strftime(ts, '%Y-%m-%d'),
                              user_id % 16) AS kn
        FROM events
    ), released AS (SELECT * FROM q WHERE kn >= {_KANON_K})
    SELECT event_type, day, user_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM released GROUP BY 1, 2, 3
    UNION ALL
    SELECT '__SUPPRESSED__' AS event_type, 'ALL' AS day,
           CAST(-1 AS BIGINT) AS user_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM q WHERE kn < {_KANON_K}
    """,
)
def k_anonymous_event_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governance release gate: events projected to the quasi-identifier
    triple (event_type, day, user bucket) are released only where the
    combination occurs ≥ k times (operators/anonymize.py:k_anonymize —
    suppression-only k-anonymity, one window count, no join). The gate
    output is the released histogram — every group provably ≥ k — plus
    one audit row counting the suppressed remainder, so the hash pins
    BOTH halves: releasing a rare combo or over-suppressing a common one
    each flips a row."""
    from ..operators.anonymize import k_anonymize

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (F.col("user_id") % 16).cast("long").alias("user_bucket"),
    )
    quasi = ["event_type", "day", "user_bucket"]
    released = (
        k_anonymize(ev, quasi, _KANON_K)
        .groupBy(*quasi)
        .agg(F.count("*").alias("n_rows"))
    )
    # The audit row is part of the SAME lazy plan (no driver-side
    # counts): the suppressed remainder is everything k_anonymize drops.
    kn = F.count("*").over(W.partitionBy(*quasi))
    suppressed = (
        ev.withColumn("_kn", kn)
        .filter(F.col("_kn") < _KANON_K)
        .agg(F.count("*").alias("n_rows"))
        .select(
            F.lit("__SUPPRESSED__").alias("event_type"),
            F.lit("ALL").alias("day"),
            F.lit(-1).cast("long").alias("user_bucket"),
            F.col("n_rows"),
        )
    )
    return released.unionByName(suppressed)


_CUPED_SPLIT_DAY = "2024-01-16"

_CUPED_UNITS_SQL = f"""
    SELECT CAST(user_id % 2 AS BIGINT) AS variant,
           CAST(SUM(CASE WHEN strftime(ts, '%Y-%m-%d') < '{_CUPED_SPLIT_DAY}'
                         THEN CAST(ROUND(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS x_cents,
           CAST(SUM(CASE WHEN strftime(ts, '%Y-%m-%d') >= '{_CUPED_SPLIT_DAY}'
                         THEN CAST(ROUND(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS y_cents
    FROM events GROUP BY user_id, variant
"""


def _cuped_oracle() -> str:
    from ..operators.experiment import cuped_adjust_oracle_sql

    return cuped_adjust_oracle_sql(
        _CUPED_UNITS_SQL, "variant", "x_cents", "y_cents")


@query("ab_cuped_adjusted_value", oracle=_cuped_oracle())
def ab_cuped_adjusted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (operators/experiment.py):
    users split into two deterministic variants (user_id parity), the
    pre-period value total (days before {split}) as the covariate, the
    post-period total as the metric. θ = Cov(X,Y)/Var(X) from EXACT
    BIGINT moments (covar_samp/var_samp are float-order dependent —
    the trend_slope lesson); the adjusted means shift each variant by
    the pooled regression on its covariate imbalance. On this fixture
    the variants are exchangeable, so adjusted ≈ raw — the gate
    verifies the estimator arithmetic, not a synthetic lift. One fact
    shuffle (per-user aggregate); moments broadcast."""
    from ..operators.experiment import cuped_adjust

    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    day = F.date_format("ts", "yyyy-MM-dd")
    units = (
        ev.groupBy(
            "user_id",
            (F.col("user_id") % 2).cast("long").alias("variant"),
        )
        .agg(
            F.sum(F.when(day < _CUPED_SPLIT_DAY, cents).otherwise(0))
            .alias("x_cents"),
            F.sum(F.when(day >= _CUPED_SPLIT_DAY, cents).otherwise(0))
            .alias("y_cents"),
        )
    )
    return cuped_adjust(units, "variant", "x_cents", "y_cents")
