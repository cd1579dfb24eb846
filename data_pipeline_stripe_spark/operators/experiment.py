"""CUPED-adjusted experiment readout — the variance-reduction verb every
experimentation platform runs (Deng et al., WSDM'13: use a pre-period
covariate X to shrink the post-period metric Y's variance):

    θ      = Cov(X, Y) / Var(X)           (pooled, all units)
    Ŷ_adj  = mean(Y|variant) − θ·(mean(X|variant) − mean(X))

Numeric policy (the trend_slope pattern): θ's numerator and denominator
are EXACT BIGINT moment combinations — n·ΣXY − ΣX·ΣY and
n·ΣX² − (ΣX)² over integer (cent-quantized) inputs — so the only float
steps are a handful of final IEEE divisions/multiplications performed in
the same textual order on both engines. Engine-native covar_samp /
var_samp are float-accumulation-order dependent and would not be
partitioning-reproducible.

Overflow bound: with per-unit cent totals ≤ c and n units,
n·ΣX² ≤ n²·c²; keep n·c below ~3e9 (e.g. 30M users with $1,000 cent
totals) or pre-scale the covariate — documented, not silently wrong.

Scale shape: one per-unit aggregate (the only fact shuffle), one global
moment row (broadcast), one |variants|-row aggregate — O(fact) work,
O(1) result.

Reference scope: beyond the reference (X-surface / decision support).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._names import reject_reserved

_OUT_COLS = ["n_units", "mean_y", "adjusted_mean_y", "theta"]


def cuped_adjust(units: DataFrame, variant_col: str,
                 x_col: str, y_col: str) -> DataFrame:
    """Per-variant CUPED readout over a one-row-per-unit frame with
    BIGINT pre-period ``x_col`` and post-period ``y_col``. Returns one
    row per variant: ``n_units``, raw ``mean_y``, ``adjusted_mean_y``
    and the pooled ``theta`` (same value on every row, ROUND(…, 6);
    means ROUND(…, 4)). Degenerate Var(X)=0 yields θ=0 (no adjustment),
    matching the estimator's limit."""
    reject_reserved(units.columns, _OUT_COLS, "cuped_adjust")
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    glob = units.agg(
        F.count("*").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    )
    per_variant = units.groupBy(variant_col).agg(
        F.count("*").alias("n_units"),
        F.sum(x).alias("_vx"),
        F.sum(y).alias("_vy"),
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    theta = F.when(den != 0,
                   num.cast("double") / den.cast("double")).otherwise(0.0)
    mean_y = F.col("_vy").cast("double") / F.col("n_units")
    mean_x = F.col("_vx").cast("double") / F.col("n_units")
    gmean_x = F.col("_sx").cast("double") / F.col("_n")
    return (
        per_variant.join(F.broadcast(glob))
        .select(
            variant_col,
            "n_units",
            F.round(mean_y / 100.0, 4).alias("mean_y"),
            F.round((mean_y - theta * (mean_x - gmean_x)) / 100.0, 4)
            .alias("adjusted_mean_y"),
            F.round(theta, 6).alias("theta"),
        )
    )


def cuped_adjust_oracle_sql(units_sql: str, variant_col: str,
                            x_col: str, y_col: str) -> str:
    """DuckDB transcription of :func:`cuped_adjust` — identical moment
    arithmetic and division order."""
    return f"""
    WITH u AS ({units_sql}),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM({x_col}) AS BIGINT) AS sx,
               CAST(SUM({y_col}) AS BIGINT) AS sy,
               CAST(SUM({x_col} * {y_col}) AS BIGINT) AS sxy,
               CAST(SUM({x_col} * {x_col}) AS BIGINT) AS sxx
        FROM u
    ),
    v AS (
        SELECT {variant_col},
               CAST(COUNT(*) AS BIGINT) AS n_units,
               CAST(SUM({x_col}) AS BIGINT) AS vx,
               CAST(SUM({y_col}) AS BIGINT) AS vy
        FROM u GROUP BY 1
    )
    SELECT {variant_col}, n_units,
           ROUND(CAST(vy AS DOUBLE) / n_units / 100.0, 4) AS mean_y,
           ROUND((CAST(vy AS DOUBLE) / n_units
                  - (CASE WHEN n * sxx - sx * sx != 0
                          THEN CAST(n * sxy - sx * sy AS DOUBLE)
                               / CAST(n * sxx - sx * sx AS DOUBLE)
                          ELSE 0.0 END)
                    * (CAST(vx AS DOUBLE) / n_units
                       - CAST(sx AS DOUBLE) / n)) / 100.0, 4)
               AS adjusted_mean_y,
           ROUND(CASE WHEN n * sxx - sx * sx != 0
                      THEN CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE)
                      ELSE 0.0 END, 6) AS theta
    FROM v, g
    """
