"""Lakehouse-format connectors (Delta / Iceberg / Hudi) — gated stubs.

At 100 TB the events store is not a prefix of JSON blobs (reference
process.py:54) but a table format with ACID appends, compaction, and
data-skipping statistics; the engine's read path is then
``spark.read.format("delta")`` (or an Iceberg catalog table) with
everything downstream unchanged. The format jars are not in this
image, so these helpers raise a clear error unless the package is
present — the call sites and config shape are real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DELTA_HINT = (
    "Delta Lake requires the delta-spark package and "
    "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension; "
    "not available in this image"
)
_ICEBERG_HINT = (
    "Iceberg requires the iceberg-spark-runtime jar and a catalog config "
    "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog); "
    "not available in this image"
)


def delta_available() -> bool:
    try:
        import delta  # noqa: F401
        return True
    except ImportError:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not delta_available():
        raise NotImplementedError(_DELTA_HINT)
    return spark.read.format("delta").load(path)  # pragma: no cover


def write_delta(df: DataFrame, path: str, partition_by: list[str] | None = None
                ) -> None:
    if not delta_available():
        raise NotImplementedError(_DELTA_HINT)
    w = df.write.format("delta").mode("overwrite")  # pragma: no cover
    if partition_by:  # pragma: no cover
        w = w.partitionBy(*partition_by)
    w.save(path)  # pragma: no cover


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    if not iceberg_available(spark):
        raise NotImplementedError(_ICEBERG_HINT)
    return spark.read.table(table)  # pragma: no cover
