"""Distribution drift between two slices of the same measure — the
monitoring verb behind "did this week's data change shape?" (feature
drift gates in training pipelines, schema-on-read quality dashboards).

Population Stability Index over FIXED bins:

    PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

with add-one (Laplace) smoothing so empty bins are defined. Rules of
thumb: < 0.1 stable, 0.1–0.25 shifting, > 0.25 drifted.

Determinism policy: bins are CALLER-FIXED integer cent edges — never
data-derived quantiles, which would make the bin boundaries themselves
float-unstable (the winsorize lesson). The smoothed counts are exact
integers on both engines; the only float steps are the final
probability divisions and ln(), identical-input IEEE ops that the
9-digit canon tolerates (same class as the TF-IDF queries' ln). The
PSI is additionally rounded to 6 digits on both sides.

Scale shape: one pass over each slice building per-(key, bin) counts
(map-side combinable; post-shuffle rows = keys × bins), a tiny
full-outer merge on (key, bin), one grouped sum. No raw-data joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._names import reject_reserved


def _binned(df: DataFrame, keys: list[str], col: str,
            edges: list[int], scale: int, side: str) -> DataFrame:
    cents = F.round(F.col(col) * scale).cast("long")
    bin_id = F.lit(0)
    for i, e in enumerate(edges):
        bin_id = F.when(cents >= e, i + 1).otherwise(bin_id)
    return (df.select(*keys, bin_id.alias("bin"))
              .groupBy(*keys, "bin")
              .agg(F.count("*").cast("long").alias(f"n_{side}")))


def psi_drift(df_a: DataFrame, df_b: DataFrame, keys: list[str],
              col: str, edges: list[int],
              scale: int = 100) -> DataFrame:
    """Per-``keys`` PSI of ``col`` between slice A (reference) and
    slice B (current). ``edges`` are ascending integer cent thresholds;
    values < edges[0] fall in bin 0, >= edges[-1] in bin len(edges) —
    len(edges)+1 bins total. Returns (keys, n_a, n_b, psi)."""
    reject_reserved(keys, ["bin", "n_a", "n_b", "psi", "tot_a", "tot_b",
                           "bins"], "psi_drift")
    a = _binned(df_a, keys, col, edges, scale, "a")
    b = _binned(df_b, keys, col, edges, scale, "b")
    n_bins = len(edges) + 1
    m = (
        a.join(b, [*keys, "bin"], "full_outer")
        .select(*keys, "bin",
                F.coalesce("n_a", F.lit(0)).alias("n_a"),
                F.coalesce("n_b", F.lit(0)).alias("n_b"))
    )
    # aggregate counts first, then fold the PSI sum over the <= n_bins
    # rows per key IN BIN ORDER — a distributed float SUM would add in
    # partition order, making the last ulp nondeterministic; the sorted
    # fold is bit-stable under any partitioning. The smoothing
    # denominator uses the FIXED bin count so it is independent of
    # which bins happen to be occupied.
    per_bin = (
        m.groupBy(*keys)
        .agg(F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b"),
             F.array_sort(F.collect_list(F.struct("bin", "n_a", "n_b")))
              .alias("bins"))
    )
    term = (
        "aggregate(bins, CAST(0.0 AS DOUBLE), (acc, x) -> acc + "
        f"(((x.n_a + 1) / CAST(tot_a + {n_bins} AS DOUBLE)) - "
        f" ((x.n_b + 1) / CAST(tot_b + {n_bins} AS DOUBLE))) * "
        f"ln(((x.n_a + 1) / CAST(tot_a + {n_bins} AS DOUBLE)) / "
        f"    ((x.n_b + 1) / CAST(tot_b + {n_bins} AS DOUBLE))))"
    )
    return per_bin.select(
        *keys,
        F.col("tot_a").cast("long").alias("n_a"),
        F.col("tot_b").cast("long").alias("n_b"),
        F.round(F.expr(term), 6).alias("psi"),
    )


def ks_distance(df_a: DataFrame, df_b: DataFrame, keys: list[str],
                col: str, scale: int = 100) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance per key — PSI's
    nonparametric companion, and unlike PSI it needs NO binning choice
    and NO float accumulation at all:

        D = max_x |F_a(x) − F_b(x)|

    evaluated on the exact cent grid. The ECDFs are integer running
    sums over the union grid (a side missing a grid point contributes 0
    there — running sums give last-observation-carried-forward ECDF
    semantics for free), and the comparison is cross-multiplied to stay
    in BIGINT:

        |cum_a·tot_b − cum_b·tot_a|   (max'd exactly)

    with the single float step D = max_num / (tot_a·tot_b) one
    correctly-rounded IEEE division. A step ECDF difference changes
    only at observed values, so the max over grid points IS the sup.

    Scale shape: one map-side-combinable histogram pass per slice, a
    keys×grid merge, one window ordered by cent value. Overflow bound:
    n_a·n_b < 2^62 per key — at 100 TB pre-aggregate to the cent
    histogram first (this operator already does) and the bound is on
    ROW counts per key, not distinct cents."""
    from pyspark.sql.window import Window as W

    reject_reserved(keys, ["c", "n_a", "n_b", "ks", "cum_a", "cum_b",
                           "tot_a", "tot_b", "_num"], "ks_distance")

    # NULL values are excluded on BOTH engines (they are not part of a
    # value distribution, and the engines disagree on NULL sort order:
    # Spark NULLS FIRST vs DuckDB NULLS LAST — a latent cum divergence).
    a = (df_a.filter(F.col(col).isNotNull())
         .select(*keys,
                 F.round(F.col(col) * scale).cast("long").alias("c"))
         .groupBy(*keys, "c").agg(F.count("*").cast("long").alias("n_a")))
    b = (df_b.filter(F.col(col).isNotNull())
         .select(*keys,
                 F.round(F.col(col) * scale).cast("long").alias("c"))
         .groupBy(*keys, "c").agg(F.count("*").cast("long").alias("n_b")))
    m = (a.join(b, [*keys, "c"], "full_outer")
          .select(*keys, "c",
                  F.coalesce("n_a", F.lit(0)).alias("n_a"),
                  F.coalesce("n_b", F.lit(0)).alias("n_b")))
    grp = W.partitionBy(*keys)
    cum = grp.orderBy("c").rowsBetween(W.unboundedPreceding, W.currentRow)
    t = m.select(
        *keys,
        F.sum("n_a").over(cum).alias("cum_a"),
        F.sum("n_b").over(cum).alias("cum_b"),
        F.sum("n_a").over(grp).alias("tot_a"),
        F.sum("n_b").over(grp).alias("tot_b"),
    )
    return (
        t.groupBy(*keys)
        .agg(F.max(F.abs(F.col("cum_a") * F.col("tot_b")
                         - F.col("cum_b") * F.col("tot_a"))).alias("_num"),
             F.max("tot_a").cast("long").alias("n_a"),
             F.max("tot_b").cast("long").alias("n_b"))
        .select(*keys, "n_a", "n_b",
                F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                       F.col("_num") / (F.col("n_a") * F.col("n_b")))
                 .alias("ks"))
    )


def ks_distance_oracle_sql(inner_a: str, inner_b: str, keys: str,
                           col: str, scale: int = 100) -> str:
    """DuckDB transcription of ``ks_distance`` over two relations that
    each expose ({keys}, {col})."""
    return f"""
    WITH ha AS (
        SELECT {keys}, CAST(ROUND({col} * {scale}) AS BIGINT) AS c,
               CAST(COUNT(*) AS BIGINT) AS n_a
        FROM ({inner_a}) WHERE {col} IS NOT NULL GROUP BY ALL
    ), hb AS (
        SELECT {keys}, CAST(ROUND({col} * {scale}) AS BIGINT) AS c,
               CAST(COUNT(*) AS BIGINT) AS n_b
        FROM ({inner_b}) WHERE {col} IS NOT NULL GROUP BY ALL
    ), m AS (
        SELECT COALESCE(ha.{keys}, hb.{keys}) AS {keys},
               COALESCE(ha.c, hb.c) AS c,
               COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
        FROM ha FULL OUTER JOIN hb
          ON ha.{keys} = hb.{keys} AND ha.c = hb.c
    ), t AS (
        SELECT {keys},
               SUM(n_a) OVER (PARTITION BY {keys} ORDER BY c) AS cum_a,
               SUM(n_b) OVER (PARTITION BY {keys} ORDER BY c) AS cum_b,
               SUM(n_a) OVER (PARTITION BY {keys}) AS tot_a,
               SUM(n_b) OVER (PARTITION BY {keys}) AS tot_b
        FROM m
    )
    SELECT {keys},
           CAST(MAX(tot_a) AS BIGINT) AS n_a,
           CAST(MAX(tot_b) AS BIGINT) AS n_b,
           CASE WHEN MAX(tot_a) > 0 AND MAX(tot_b) > 0 THEN
               MAX(ABS(cum_a * tot_b - cum_b * tot_a))
               / CAST(MAX(tot_a) * MAX(tot_b) AS DOUBLE) END AS ks
    FROM t GROUP BY {keys}
    """
