"""Distributed sources replacing the reference's driver-side ingest loops.

The reference downloads every GCS event blob on the driver, one HTTP GET at
a time (reference top10.py:137-168, platform_usage.py:22-53,
royalties.py:145-176), streams Firestore collections into Python lists
(top10.py:87-114, royalties.py:95-122), and fetches REST dims with
``requests`` (top10.py:35-59). At 100 TB the driver loop is the bottleneck;
here every large source is a ``spark.read`` — listed, split and parsed by
executors, with predicate pushdown and partition pruning intact.

Small dimensions (categories, exchange rates) legitimately fit on the
driver: ``read_dim_rows`` builds them from an in-memory payload with an
explicit schema, and callers broadcast-join them.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import EVENTS_RAW_SCHEMA, TABLE_NAMES, TESTDATA_SCHEMAS


def read_events_json(spark: SparkSession, path_glob: str,
                     schema: T.StructType = EVENTS_RAW_SCHEMA) -> DataFrame:
    """Distributed scan of one-JSON-object-per-file event blobs.

    Replaces the driver loop at reference top10.py:147-166 with
    ``spark.read.schema(...).json(glob)`` — file listing and JSON parsing
    happen on executors; an explicit schema avoids a sampling pass.
    """
    return spark.read.schema(schema).json(path_glob)


def read_dim_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Header CSV dimension with a declared schema (no inferSchema pass).

    Reference: royalties.py:66-68 (`inferSchema=True` → a full extra scan).
    """
    return spark.read.csv(path, header=True, schema=schema)


def read_dim_rows(spark: SparkSession, rows: Iterable[Mapping[str, Any]],
                  schema: T.StructType) -> DataFrame:
    """Small dimension from an in-memory payload (REST response, rate dict).

    Replaces ``createDataFrame(list_of_dicts)`` with inferred schema
    (reference top10.py:57,112) and the exchange-rate closure dict
    (royalties.py:210-214,306) with a proper DataFrame that callers
    broadcast-join.
    """
    ordered = [tuple(r.get(f.name) for f in schema.fields) for r in rows]
    return spark.createDataFrame(ordered, schema)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver test table (TESTDATA.md) as a DataFrame.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as epoch-nanos
    LongType and is converted here to a proper TimestampType (microsecond,
    floor-truncated — matching DuckDB's ns→us cast).
    """
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: Iterable[str] = TABLE_NAMES) -> dict[str, DataFrame]:
    """Load test tables and register each as a temp view (SQL surface)."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
