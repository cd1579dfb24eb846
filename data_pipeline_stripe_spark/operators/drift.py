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
