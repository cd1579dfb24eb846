"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every declared operator from SURVEY.md §2 (+ LLM extensions) as
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives each one a DuckDB
ANSI-SQL twin — since round 6 EVERY query has one (the approximate
operators run cross-engine-deterministic sketches, so even they are
hash-checkable). Implementations live in ``data_pipeline_stripe_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_stripe_spark.queries import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: daily top-10 groups by
    purchase count (the reference's top10.py report, rebuilt as a single
    windowed plan)."""
    from data_pipeline_stripe_spark.queries import REGISTRY

    return REGISTRY["top10_event_types_daily"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator (SURVEY.md §2)."""
    import data_pipeline_stripe_spark.queries  # noqa: F401  (populates REGISTRY)

    return _registry.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-executable ANSI SQL twin for each SQL-expressible query."""
    import data_pipeline_stripe_spark.queries  # noqa: F401

    return _registry.oracle_queries()
