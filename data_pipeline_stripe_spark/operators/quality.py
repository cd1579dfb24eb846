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


@dataclass(frozen=True)
class Check:
    name: str
    kind: str                       # row | unique | foreign_key
    predicate: Column | None = None  # row-level: TRUE == violation
    keys: tuple[str, ...] = ()
    dim: DataFrame | None = field(default=None, compare=False)
    fact_col: str = ""
    dim_col: str = ""


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", "row", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(f"in_range({col},{lo},{hi})", "row",
                 c.isNull() | (c < lo) | (c > hi))


def accepted_values(col: str, values: list) -> Check:
    return Check(f"accepted_values({col})", "row",
                 ~F.col(col).isin(values) | F.col(col).isNull())


def matches_regex(col: str, pattern: str) -> Check:
    return Check(f"matches_regex({col})", "row",
                 F.col(col).isNull() | ~F.col(col).rlike(pattern))


def unique(*cols: str) -> Check:
    return Check(f"unique({','.join(cols)})", "unique", keys=tuple(cols))


def foreign_key(fact_col: str, dim: DataFrame, dim_col: str) -> Check:
    return Check(f"foreign_key({fact_col}->{dim_col})", "foreign_key",
                 dim=dim, fact_col=fact_col, dim_col=dim_col)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check; returns (check, violations, total) with one
    row per check. Row-level checks share a single aggregate job over
    one scan; each unique/foreign_key check adds one keyed job on its
    own natural key."""
    spark = df.sparkSession
    total = F.count("*")
    reports: list[DataFrame] = []

    row_checks = [c for c in checks if c.kind == "row"]
    if row_checks:
        aggs = [F.sum(F.when(c.predicate, 1).otherwise(0)).cast("long")
                .alias(f"v{i}") for i, c in enumerate(row_checks)]
        row = df.agg(*aggs, total.alias("_t")).collect()[0]
        reports.append(spark.createDataFrame(
            [(c.name, row[f"v{i}"], row["_t"])
             for i, c in enumerate(row_checks)],
            "check string, violations long, total long"))

    for c in checks:
        if c.kind == "unique":
            dup = (
                df.groupBy(*c.keys).agg(F.count("*").alias("n"))
                .filter(F.col("n") > 1)
                .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("violations"))
            )
            n_total = df.agg(total.alias("t")).collect()[0].t
            v = dup.collect()[0].violations
            reports.append(spark.createDataFrame(
                [(c.name, int(v), int(n_total))],
                "check string, violations long, total long"))
        elif c.kind == "foreign_key":
            orphans = (
                df.select(F.col(c.fact_col)).filter(
                    F.col(c.fact_col).isNotNull())
                .join(F.broadcast(c.dim.select(
                    F.col(c.dim_col).alias(c.fact_col))),
                    c.fact_col, "left_anti")
                .count()
            )
            n_total = df.count()
            reports.append(spark.createDataFrame(
                [(c.name, int(orphans), int(n_total))],
                "check string, violations long, total long"))

    if not reports:
        return spark.createDataFrame(
            [], "check string, violations long, total long")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
