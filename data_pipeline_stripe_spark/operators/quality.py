"""Declarative data-quality checks compiled to minimal Spark jobs.

The expectation-suite verb (Deequ / dbt-test class) a production ingest
runs before publishing a batch: declare constraints, get back one small
report row per constraint with violation counts. The compilation rule
is what makes it 100 TB-shaped:

- every ROW-LEVEL check (not-null, range, accepted values, regex)
  becomes a conditional-sum column in ONE aggregate over ONE scan of
  the fact — adding a check adds an expression, never a pass (same
  one-scan pattern as profile_orders_columns);
- UNIQUENESS is the one check that inherently needs a shuffle (groupBy
  on the key, count>1) — one exchange per declared key set;
- REFERENTIAL integrity is a left-anti join against the (broadcast)
  dimension — no fact shuffle.

Counts are exact integers; the report is a DataFrame, so gating a
pipeline is `.filter(violations > 0).count() == 0` and publishing the
report is any sink. Reference parity: the reference pipelines publish
reports with no validation at all (SURVEY §3); this is the missing
pre-publish gate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.readers import inline_dim


@dataclass(frozen=True)
class Check:
    name: str
    kind: str                       # row | unique | foreign_key
    # Column and DataFrame have no value equality/hash (Column.__eq__
    # builds an expression) — exclude them so Check == Check / set(...)
    # compare by (name, kind, keys, cols) instead of crashing
    predicate: Column | None = field(default=None, compare=False)
    keys: tuple[str, ...] = ()
    dim: DataFrame | None = field(default=None, compare=False)
    fact_col: str = ""
    dim_col: str = ""


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", "row", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    """NULL counts as a violation (fail-closed — dbt/Deequ skip NULLs;
    here an unexpected NULL must not pass a range gate unnoticed).
    For a nullable-by-design column, filter NULLs out before the check
    or rely on not_null to own the null policy; declaring both not_null
    and in_range on one column reports a NULL under both names."""
    c = F.col(col)
    return Check(f"in_range({col},{lo},{hi})", "row",
                 c.isNull() | (c < lo) | (c > hi))


def accepted_values(col: str, values: list) -> Check:
    """NULL counts as a violation — same fail-closed policy as
    in_range (see its docstring)."""
    return Check(f"accepted_values({col})", "row",
                 ~F.col(col).isin(values) | F.col(col).isNull())


def matches_regex(col: str, pattern: str) -> Check:
    """NULL counts as a violation — same fail-closed policy as
    in_range (see its docstring)."""
    return Check(f"matches_regex({col})", "row",
                 F.col(col).isNull() | ~F.col(col).rlike(pattern))


def unique(*cols: str) -> Check:
    return Check(f"unique({','.join(cols)})", "unique", keys=tuple(cols))


def foreign_key(fact_col: str, dim: DataFrame, dim_col: str) -> Check:
    return Check(f"foreign_key({fact_col}->{dim_col})", "foreign_key",
                 dim=dim, fact_col=fact_col, dim_col=dim_col)


def _row_check_aggregate(df: DataFrame, row_checks: list[Check]) -> DataFrame:
    """The shared one-scan aggregate for every row-level check (split
    out so tests can pin ITS plan, not a lookalike): violation counts
    coalesce to 0 so an empty batch — a no-new-data day — reports clean,
    not NULL."""
    aggs = [
        F.coalesce(F.sum(F.when(c.predicate, 1).otherwise(0)), F.lit(0))
        .cast("long").alias(f"v{i}")
        for i, c in enumerate(row_checks)
    ]
    return df.agg(*aggs, F.count("*").alias("_t"))


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check; returns (check, violations, total) with one
    row per check. Row-level checks share a single aggregate job over
    one scan (and the batch TOTAL is computed exactly once, there or in
    one count — never per check); each unique/foreign_key check adds one
    keyed job on its own natural key. Unknown check kinds raise: a
    validation gate must fail CLOSED, never silently skip a
    constraint."""
    spark = df.sparkSession
    unknown = [c.name for c in checks
               if c.kind not in ("row", "unique", "foreign_key")]
    if unknown:
        raise ValueError(f"unknown check kind(s): {unknown}")

    rows: list[tuple[str, int, int]] = []
    row_checks = [c for c in checks if c.kind == "row"]
    n_total: int | None = None
    if row_checks:
        agg = _row_check_aggregate(df, row_checks).collect()[0]
        n_total = agg["_t"]
        rows += [(c.name, int(agg[f"v{i}"]), int(n_total))
                 for i, c in enumerate(row_checks)]

    for c in checks:
        if c.kind in ("unique", "foreign_key") and n_total is None:
            n_total = df.count()
        if c.kind == "unique":
            v = (
                df.groupBy(*c.keys).agg(F.count("*").alias("n"))
                .filter(F.col("n") > 1)
                .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("v"))
                .collect()[0].v
            )
            rows.append((c.name, int(v), int(n_total)))
        elif c.kind == "foreign_key":
            orphans = (
                df.select(F.col(c.fact_col)).filter(
                    F.col(c.fact_col).isNotNull())
                .join(F.broadcast(c.dim.select(
                    F.col(c.dim_col).alias(c.fact_col))),
                    c.fact_col, "left_anti")
                .count()
            )
            rows.append((c.name, int(orphans), int(n_total)))

    # JVM VALUES form — a local list through createDataFrame costs
    # seconds of Python tasks per materialization on a wide local master
    # (sources/readers.inline_dim)
    return inline_dim(spark, rows,
                      "check string, violations long, total long")
