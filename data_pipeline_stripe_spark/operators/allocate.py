"""Largest-remainder proportional allocation: distribute an integer
budget of ``total`` units across the rows of each group, proportional
to an integer weight, such that the allocations are integers and SUM
EXACTLY to ``total`` per group — the financial-allocation verb (budget
splits, revenue sharing, seat apportionment; Hamilton's method).

Naive ``round(total * w / W)`` drifts by several units per group and
the drift direction depends on float rounding; this is the exact
integer form: floor(total·w/W) first, then the leftover
``total − Σfloor`` units (< number of rows) go one-each to the largest
fractional remainders, ties broken on the caller's key so the result is
deterministic on any engine.

Scale shape: everything is windows over the allocation group — one
shuffle on ``keys``, no joins, no collect. Overflow bound: total·w is
computed in BIGINT, so keep total ≤ 2^20 while group weight sums stay
below 2^43 (cents at 100 TB: allocate per partition-key group, not
globally).

Reference scope note: the reference's royalty split (royalties.py:
232-317) multiplies by float rates row-at-a-time and never reconciles
the parts to the whole; this operator is the exact-sum version of that
business need (X-surface, SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ._names import free_name, reject_reserved


def allocate_proportional(df: DataFrame, keys: list[str], id_col: str,
                          weight_col: str, total: int) -> DataFrame:
    """Adds ``alloc_units`` to one-row-per-``id_col``-per-group ``df``:
    integer units of ``total`` proportional to BIGINT ``weight_col``
    (weights must be >= 0; a zero-weight row can still receive one
    remainder unit only if every weight in its group is zero — W = 0
    groups allocate nothing). Ties on the fractional remainder break by
    ``id_col`` ascending. Per-group invariant (pinned in tests):
    SUM(alloc_units) == total wherever the group weight sum > 0."""
    reject_reserved(df.columns, ["alloc_units"], "allocate_proportional")
    # internal working columns derived collision-free (gapfill lesson:
    # withColumn on a caller-owned name silently replaces it)
    taken = set(df.columns)
    wsum, numc, flo, rem, left, rk_c = (
        free_name(taken, b)
        for b in ("_wsum", "_num", "_floor", "_rem", "_left", "_rk"))
    grp = W.partitionBy(*keys)
    t_lit = F.lit(int(total)).cast("long")
    num = F.col(weight_col).cast("long") * t_lit
    t = df.withColumn(wsum, F.sum(weight_col).over(grp).cast("long"))
    # integer floor and remainder of num / W (num, W >= 0 so div == floor)
    t = (
        t.withColumn(numc, num)
        .withColumn(flo, F.when(F.col(wsum) > 0,
                                F.expr(f"{numc} div {wsum}"))
                          .otherwise(F.lit(0)).cast("long"))
        .withColumn(rem, F.when(F.col(wsum) > 0,
                                F.expr(f"{numc} % {wsum}"))
                          .otherwise(F.lit(0)).cast("long"))
    )
    leftover = t_lit - F.sum(flo).over(grp)
    rk = F.row_number().over(
        grp.orderBy(F.col(rem).desc(), F.col(id_col).asc()))
    return (
        t.withColumn(left, F.when(F.col(wsum) > 0, leftover)
                            .otherwise(F.lit(0)))
        .withColumn(rk_c, rk)
        .withColumn("alloc_units",
                    (F.col(flo)
                     + F.when(F.col(rk_c) <= F.col(left), 1)
                        .otherwise(0)).cast("long"))
        .drop(wsum, numc, flo, rem, left, rk_c)
    )


def allocate_proportional_oracle_sql(inner: str, keys: str, id_col: str,
                                     weight_col: str, total: int,
                                     select: str = "*",
                                     out_col: str = "alloc_units") -> str:
    """DuckDB transcription of ``allocate_proportional`` over the
    ``inner`` relation (one row per id per group). Positive weights
    make DuckDB's flooring ``//`` equal Spark's truncating ``div``.
    ``out_col`` names the allocation column (callers that rename the
    Spark side pass the same name here instead of string-editing the
    generated SQL)."""
    t = int(total)
    return f"""
    WITH base AS (
        SELECT *,
               SUM({weight_col}) OVER (PARTITION BY {keys}) AS wsum
        FROM ({inner})
    ), fl AS (
        SELECT *,
               CASE WHEN wsum > 0
                    THEN ({weight_col} * CAST({t} AS BIGINT)) // wsum
                    ELSE 0 END AS floor_u,
               CASE WHEN wsum > 0
                    THEN ({weight_col} * CAST({t} AS BIGINT)) % wsum
                    ELSE 0 END AS rem
        FROM base
    ), rk AS (
        SELECT *,
               CASE WHEN wsum > 0
                    THEN {t} - SUM(floor_u) OVER (PARTITION BY {keys})
                    ELSE 0 END AS leftover,
               ROW_NUMBER() OVER (PARTITION BY {keys}
                                  ORDER BY rem DESC, {id_col} ASC) AS rn
        FROM fl
    )
    SELECT {select},
           CAST(floor_u + CASE WHEN rn <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS {out_col}
    FROM rk
    """
