"""Exact-rational regression and concentration statistics — the
closed-form analytics verbs (trend detection, inequality/concentration
audits) computed so that every sum is a BIGINT and the only float step
is a final correctly-rounded IEEE division, making the DuckDB oracle a
transcription (the repo numeric policy; see the dyadic EMA for the same
trick on smoothing).

Reference scope note: the reference reports levels only (counts, sums,
shares — top10.py:137-278, platform_usage.py:22-239); direction
(slope) and concentration (Gini) are the first questions a consumer of
those reports asks next (X-surface, SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ._names import reject_reserved


def trend_slope(df: DataFrame, keys: list[str], x_col: str,
                y_col: str) -> DataFrame:
    """Per-key ordinary-least-squares line fit of integer ``y_col``
    against integer ``x_col``:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)

    Numerator and denominator are EXACT BIGINTs (one grouped pass,
    map-side combinable), so each output is one IEEE division —
    bit-identical on any engine, unlike covariance/variance streaming
    forms whose float accumulation order varies with partitioning.

    Caller contract: pre-center ``x`` on a fixed reference (e.g. days
    since a constant date) and quantize ``y`` to cents; the overflow
    bound is max(|Σy·Σx²|, |n·Σxy|) < 2^63 — at 100 TB keep keys
    fine-grained or pre-aggregate y per x first. Keys with a single
    distinct x have denominator 0 → NULL slope/intercept (both
    engines)."""
    reject_reserved(keys, ["n", "sx", "sy", "sxx", "sxy", "slope",
                           "intercept"], "trend_slope")
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        *keys,
        F.col("n"),
        F.when(den != 0,
               (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
               / den).alias("slope"),
        F.when(den != 0,
               (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
               / den).alias("intercept"),
    )


def trend_slope_oracle_sql(inner: str, keys: str, x_col: str,
                           y_col: str) -> str:
    """DuckDB transcription of ``trend_slope`` (same exact BIGINT
    moments; NOT regr_slope(), whose internal accumulation is float)."""
    return f"""
    WITH m AS (
        SELECT {keys},
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM({x_col}) AS BIGINT) AS sx,
               CAST(SUM({y_col}) AS BIGINT) AS sy,
               CAST(SUM({x_col} * {x_col}) AS BIGINT) AS sxx,
               CAST(SUM({x_col} * {y_col}) AS BIGINT) AS sxy
        FROM ({inner}) GROUP BY {keys}
    )
    SELECT {keys}, n,
           CASE WHEN n * sxx - sx * sx <> 0
                THEN (n * sxy - sx * sy)
                     / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
           CASE WHEN n * sxx - sx * sx <> 0
                THEN (sy * sxx - sx * sxy)
                     / CAST(n * sxx - sx * sx AS DOUBLE) END AS intercept
    FROM m
    """


def gini(df: DataFrame, keys: list[str], w_col: str,
         id_col: str) -> DataFrame:
    """Per-key Gini coefficient of non-negative integer weights —
    0 = perfectly equal, →1 = one member holds everything:

        G = (2·Σᵢ i·wᵢ − (n+1)·Σw) / (n·Σw)

    with wᵢ ascending and i the 1-based rank. Ranks within tied weights
    are interchangeable (Σi over the tied block is order-free), so the
    ``id_col`` tie-break affects nothing but determinism of the rank
    column itself; the numerator is an exact BIGINT either way.

    One shuffle on ``keys`` (rank window + grouped sums share it).
    Overflow bound: n·Σw < 2^62 per key — at 100 TB compute Gini per
    partition-key group (region, day) rather than globally, or
    pre-bucket weights into a cent histogram and rank bins."""
    reject_reserved(keys, ["_w", "_i", "n", "sw", "siw", "total",
                           "gini"], "gini")
    rk = F.row_number().over(
        W.partitionBy(*keys).orderBy(F.col(w_col).asc(),
                                     F.col(id_col).asc()))
    t = df.select(*keys, F.col(w_col).cast("long").alias("_w"),
                  rk.cast("long").alias("_i"))
    agg = t.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_w").alias("sw"),
        F.sum(F.col("_i") * F.col("_w")).alias("siw"),
    )
    num = 2 * F.col("siw") - (F.col("n") + 1) * F.col("sw")
    den = F.col("n") * F.col("sw")
    return agg.select(
        *keys, "n", F.col("sw").alias("total"),
        F.when(den > 0, num / den).otherwise(F.lit(None)).alias("gini"),
    )


def gini_oracle_sql(inner: str, keys: str, w_col: str,
                    id_col: str) -> str:
    """DuckDB transcription of ``gini`` (same rank + exact sums)."""
    return f"""
    WITH r AS (
        SELECT {keys}, CAST({w_col} AS BIGINT) AS w,
               CAST(ROW_NUMBER() OVER (PARTITION BY {keys}
                    ORDER BY {w_col} ASC, {id_col} ASC) AS BIGINT) AS i
        FROM ({inner})
    ), m AS (
        SELECT {keys}, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(i * w) AS BIGINT) AS siw
        FROM r GROUP BY {keys}
    )
    SELECT {keys}, n, sw AS total,
           CASE WHEN n * sw > 0
                THEN (2 * siw - (n + 1) * sw)
                     / CAST(n * sw AS DOUBLE) END AS gini
    FROM m
    """


# Benford expected first-digit shares, floor(log10(1 + 1/d) · 1e6):
# fixed integer ppm constants so engine and oracle compare the SAME
# literals and the whole operator stays float-free.
BENFORD_PPM = {1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
               6: 66946, 7: 57991, 8: 51152, 9: 45757}


def benford_digit_stats(df: DataFrame, keys: list[str], col: str,
                        scale: int = 100) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    data-authenticity screen (fabricated or unit-corrupted monetary
    columns drift from log10(1+1/d); real multi-magnitude amounts
    follow it). Per (key, digit): observed count, observed share in
    ppm (floor(n·10⁶ / total) — integer division, so the OUTPUT is
    100% integer and needs no rounding policy at all), and the fixed
    Benford expectation in ppm. Zero-count digits are omitted (both
    engines identically); non-positive values are excluded — Benford
    applies to magnitudes.

    One map-side-combinable groupBy on (keys, digit) — at most 9 rows
    per key survive the shuffle — plus one per-key window. The first
    digit comes from the DECIMAL STRING of the cent value: identical,
    locale-free semantics on both engines."""
    reject_reserved(keys, ["_c", "_tot", "digit", "n", "share_ppm",
                           "benford_ppm"], "benford_digit_stats")
    c = F.round(F.col(col) * scale).cast("long")
    digit = F.substring(F.col("_c").cast("string"), 1, 1).cast("int")
    counts = (
        df.select(*keys, c.alias("_c"))
        .filter(F.col("_c") > 0)
        .groupBy(*keys, digit.alias("digit"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = F.sum("n").over(W.partitionBy(*keys))
    ppm_expr = F.expr("n * CAST(1000000 AS BIGINT) div _tot")
    expected = F.lit(None).cast("long")
    for d, p in BENFORD_PPM.items():
        expected = F.when(F.col("digit") == d, F.lit(p)).otherwise(expected)
    return (
        counts.withColumn("_tot", tot)
        .select(*keys, "digit", "n",
                ppm_expr.cast("long").alias("share_ppm"),
                expected.alias("benford_ppm"))
    )


def benford_digit_stats_oracle_sql(inner: str, keys: str, col: str,
                                   scale: int = 100) -> str:
    """DuckDB transcription of ``benford_digit_stats`` (same string
    first-digit, same integer ppm floor division, same constants)."""
    cases = " ".join(f"WHEN {d} THEN {p}"
                     for d, p in BENFORD_PPM.items())
    return f"""
    WITH q AS (
        SELECT {keys},
               CAST(ROUND({col} * {scale}) AS BIGINT) AS c
        FROM ({inner})
    ), counts AS (
        SELECT {keys},
               CAST(SUBSTRING(CAST(c AS VARCHAR), 1, 1) AS INTEGER)
                   AS digit,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM q WHERE c > 0 GROUP BY ALL
    )
    SELECT {keys}, digit, n,
           CAST(n * CAST(1000000 AS BIGINT)
                // SUM(n) OVER (PARTITION BY {keys}) AS BIGINT)
               AS share_ppm,
           CAST(CASE digit {cases} END AS BIGINT) AS benford_ppm
    FROM counts
    """
