"""Gated ingestion-robustness queries: corrupt-record quarantine and
schema-evolution reads.

The reference's ingest path assumes every blob parses and every batch
carries the same columns (reference top10.py:147-166 builds rows straight
from ``json.loads`` with no error branch; a malformed blob kills the whole
driver loop). At 100 TB neither assumption holds: upstream producers ship
truncated lines and add columns mid-quarter. These queries gate the two
engine answers inside the DuckDB differential:

- ``corrupt_json_quarantine``: PERMISSIVE JSON scan with
  ``columnNameOfCorruptRecord`` — malformed lines land in a quarantine
  bucket instead of failing the job (or silently vanishing, the
  DROPMALFORMED failure mode); clean rows aggregate exactly.
- ``schema_evolution_union_read``: two parquet batches written with
  different schemas (the new batch adds columns) read back through one
  ``mergeSchema`` scan — old rows surface the new columns as NULLs and
  every aggregate still reconciles.

Determinism notes (oracle-parity playbook): the corrupt / new-batch rules
are pure integer functions of ``event_id`` so both engines re-derive the
same split; values cross the text format as integer cents; timestamps are
rendered to strings before writing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import load_table
from .io_roundtrip import _scratch
from .registry import query

_QUARANTINE_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value_cents", T.LongType()),
    # PERMISSIVE mode parks the raw text of malformed lines here; the
    # column must be declared in the read schema to be addressable.
    T.StructField("_corrupt", T.StringType()),
])


@query(
    "corrupt_json_quarantine",
    oracle="""
    WITH tagged AS (
        SELECT CASE WHEN event_id % 13 = 0 THEN '_QUARANTINED'
                    ELSE event_type END AS event_type,
               CASE WHEN event_id % 13 = 0 THEN NULL
                    ELSE CAST(ROUND(value * 100) AS BIGINT) END AS cents,
               CASE WHEN event_id % 13 = 0 THEN NULL
                    ELSE user_id END AS uid
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(uid) AS BIGINT) AS n_parsed,
           CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS value_cents
    FROM tagged GROUP BY 1
    """,
)
def corrupt_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter ingestion: events rendered to JSONL with every 13th
    line deterministically truncated (the closing brace cut — a torn
    write), then scanned back in one distributed PERMISSIVE read. Parsed
    rows aggregate per type; malformed lines are COUNTED into a
    ``_QUARANTINED`` bucket rather than failing the scan or silently
    dropping (reference top10.py:147-166 has no error branch at all — one
    bad blob kills the ingest loop). The oracle re-derives the corruption
    rule from ``event_id``, so a hash match proves the quarantine split is
    exact: nothing lost, nothing double-counted.

    Scale shape: the corrupt branch costs one ``when`` over an already
    text-shaped scan — no extra pass, no driver involvement; the
    quarantine bucket is an ordinary group."""
    out = _scratch(sf_dir, "corrupt_json_quarantine")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.to_json(
            F.struct(
                "event_id",
                "user_id",
                "event_type",
                F.round(F.col("value") * 100).cast("long").alias(
                    "value_cents"),
            )
        ).alias("js"),
    )
    torn = F.expr("substring(js, 1, length(js) - 1)")
    ev.select(
        F.when(F.col("event_id") % 13 == 0, torn).otherwise(
            F.col("js")).alias("value")
    ).write.mode("overwrite").text(out)
    parsed = (
        spark.read.schema(_QUARANTINE_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out)
    )
    return (
        parsed.groupBy(
            F.coalesce("event_type", F.lit("_QUARANTINED")).alias(
                "event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.count("user_id").alias("n_parsed"),
            F.coalesce(F.sum("value_cents"), F.lit(0)).alias("value_cents"),
        )
    )


@query(
    "schema_evolution_union_read",
    oracle="""
    WITH unioned AS (
        SELECT event_type,
               CASE WHEN event_id % 2 = 1
                    THEN CAST(ROUND(value * 100) AS BIGINT) END AS cents,
               CASE WHEN event_id % 2 = 1
                    THEN 'ch-' || CAST(user_id % 3 AS VARCHAR) END AS channel
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(cents) AS BIGINT) AS n_with_value,
           CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS value_cents,
           CAST(COUNT(DISTINCT channel) AS BIGINT) AS n_channels
    FROM unioned GROUP BY 1
    """,
)
def schema_evolution_union_read(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Schema evolution across ingest batches: the odd-``event_id`` half
    of events is written with two EXTRA columns (``value_cents``,
    ``channel``) the even half predates; one ``mergeSchema`` parquet scan
    reads both directories and the old rows surface the new columns as
    NULLs. The aggregate reconciles totals, the NULL-skipping column
    counts, and a distinct over the new string column — a hash match
    proves widening the schema mid-corpus loses no rows and invents no
    values (the reference would need a backfill rewrite of every old
    blob).

    Scale shape: mergeSchema unions footers at planning time; the scan
    itself stays one distributed pass with column pruning intact per
    file."""
    out = _scratch(sf_dir, "schema_evolution_union_read")
    ev = load_table(spark, sf_dir, "events")
    old_batch = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "event_type"
    )
    new_batch = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.concat(F.lit("ch-"), (F.col("user_id") % 3).cast("string")).alias(
            "channel"),
    )
    old_batch.write.mode("overwrite").parquet(f"{out}/b0")
    new_batch.write.mode("overwrite").parquet(f"{out}/b1")
    merged = (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{out}/b0", f"{out}/b1")
    )
    return merged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("value_cents").alias("n_with_value"),
        F.coalesce(F.sum("value_cents"), F.lit(0)).alias("value_cents"),
        F.countDistinct("channel").alias("n_channels"),
    )


@query(
    "variant_nested_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS k_sum,
           CAST(COUNT(CASE WHEN json_extract_string(props, '$.nope')
                           IS NOT NULL THEN 1 END) AS BIGINT) AS n_missing
    FROM events GROUP BY 1
    """,
)
def variant_nested_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion, the Spark-4-native way: event payloads
    arrive as NESTED JSON (an object plus an array, the shape real event
    buses ship) and are parsed ONCE into VariantType — Spark's binary
    semi-structured encoding — then fields come out with typed
    ``variant_get`` path extraction: object paths (``$.meta.et``), array
    indexing (``$.vals[0]``), and a missing path that must yield NULL,
    not an error. The fixture's real ``props`` column rides the same
    variant path. The string twin (``json_props_extract``,
    relational2.py) re-parses the JSON text per extraction; Variant
    parses once and navigates the binary encoding — the 100 TB answer
    for wide event payloads with many extracted fields.

    The oracle re-derives every field from the raw columns, so a hash
    match proves the encode→variant→extract loop is lossless and
    correctly typed."""
    ev = load_table(spark, sf_dir, "events")
    js = F.to_json(
        F.struct(
            F.struct(
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
                F.col("event_type").alias("et"),
            ).alias("meta"),
            F.array(
                F.round(F.col("value") * 100).cast("long"),
                F.col("user_id"),
            ).alias("vals"),
        )
    )
    v = F.parse_json(js)
    pk = F.parse_json("props")
    fields = ev.select(
        F.variant_get(v, "$.meta.et", "string").alias("et"),
        F.variant_get(v, "$.vals[0]", "long").alias("cents"),
        F.variant_get(v, "$.vals[1]", "long").alias("uid"),
        F.variant_get(pk, "$.k", "long").alias("k"),
        F.try_variant_get(v, "$.nope", "string").alias("missing"),
    )
    return fields.groupBy(F.col("et").alias("event_type")).agg(
        F.count("*").alias("n_events"),
        F.sum("cents").alias("cents_sum"),
        F.countDistinct("uid").alias("n_users"),
        F.sum("k").alias("k_sum"),
        F.count("missing").alias("n_missing"),
    )


@query(
    "try_cast_dirty_values",
    oracle="""
    WITH dirty AS (
        SELECT event_type,
               CASE WHEN event_id % 5 = 0 THEN 'N/A'
                    ELSE CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR)
               END AS cents_s,
               CASE WHEN event_id % 7 = 0 THEN 'not-a-date'
                    ELSE strftime(ts, '%Y-%m-%d %H:%M:%S')
               END AS ts_s
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(TRY_CAST(cents_s AS BIGINT)) AS BIGINT) AS n_cents_ok,
           CAST(COALESCE(SUM(TRY_CAST(cents_s AS BIGINT)), 0) AS BIGINT)
               AS cents_sum,
           CAST(COUNT(TRY_CAST(ts_s AS TIMESTAMP)) AS BIGINT) AS n_ts_ok,
           MIN(strftime(TRY_CAST(ts_s AS TIMESTAMP), '%Y-%m-%d')) AS min_day
    FROM dirty GROUP BY 1
    """,
)
def try_cast_dirty_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe casting over dirty inputs: numeric and timestamp columns
    arrive as strings with deterministic garbage mixed in ('N/A' every
    5th id, an unparseable date every 7th). Spark 4 runs ANSI mode by
    default, where a plain CAST of garbage FAILS THE JOB — ``try_cast``/
    ``try_to_timestamp`` turn exactly the bad rows into NULLs, which the
    NULL-skipping aggregates then count and exclude. The oracle uses
    DuckDB's TRY_CAST for the identical semantics, so a hash match proves
    the error rows — and ONLY the error rows — fell out.

    Scale shape: try_* are ordinary JVM expressions in the scan
    projection; no error branch, no Python, no second pass."""
    ev = load_table(spark, sf_dir, "events")
    dirty = ev.select(
        "event_type",
        F.when(F.col("event_id") % 5 == 0, F.lit("N/A"))
        .otherwise(F.round(F.col("value") * 100).cast("long").cast("string"))
        .alias("cents_s"),
        F.when(F.col("event_id") % 7 == 0, F.lit("not-a-date"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .alias("ts_s"),
    )
    parsed = dirty.select(
        "event_type",
        F.col("cents_s").try_cast("long").alias("cents"),
        F.try_to_timestamp("ts_s").alias("ts"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("cents").alias("n_cents_ok"),
        F.coalesce(F.sum("cents"), F.lit(0)).alias("cents_sum"),
        F.count("ts").alias("n_ts_ok"),
        F.min(F.date_format("ts", "yyyy-MM-dd")).alias("min_day"),
    )
