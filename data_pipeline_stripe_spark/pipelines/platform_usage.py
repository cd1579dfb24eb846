"""Report 2: monthly usage percentages by country and by timezone offset.

Reference: platform_usage.py — six groupBy(sum(duration)) rounds each
self-joined back onto the events set (118-187: (month,resource), (month),
(month,country,resource), (month,country), (month,tz,resource),
(month,tz)), a Python UDF for a/b*100 (104-107), then a per-month driver
loop running two f-string SQL queries + dropDuplicates + parquet writes
(197-239). Six shuffles of the full fact, the whole DAG re-executed twice
per month.

Rebuild: ONE grouped aggregation per report at the finest granularity,
window sums over the (small) aggregate for the denominators, native
arithmetic for the percentage. Two shuffles total (agg + window) instead
of six; the month loop becomes partitionBy("month").

UDF semantics note (U1): the reference UDF raises on division by zero;
native division yields NULL — the engine takes NULL (documented
deviation, SURVEY.md §7.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _with_time_parts(events: DataFrame) -> DataFrame:
    # month = chars 1-7, tz offset = chars 20-25 of the ISO-8601 eventTime
    # string (platform_usage.py:76-81).
    return events.select(
        F.substring("eventTime", 1, 7).alias("month"),
        F.substring("eventTime", 20, 6).alias("timeZone"),
        "countryCode", "resourceId", "duration",
    )


def _usage_by(events_parts: DataFrame, dim: str) -> DataFrame:
    """Usage % of each (month, dim, resource) within its (month, dim)
    group — the reference's usage_percent_total(a, b) = a/b*100
    (platform_usage.py:104-107,202-221) with a = per-resource duration,
    b = per-group total."""
    per_resource = (
        events_parts.groupBy("month", dim, "resourceId")
        .agg(F.sum("duration").alias("resource_duration"))
    )
    w = W.partitionBy("month", dim)
    return per_resource.select(
        "month",
        dim,
        "resourceId",
        "resource_duration",
        F.round(
            F.col("resource_duration") / F.sum("resource_duration").over(w) * 100, 4
        ).alias("usage_percent"),
    )


def usage_report(events: DataFrame) -> dict[str, DataFrame]:
    """Returns {"country": df, "timezone": df} — the two reports the
    reference writes to country/ and timezone/ (platform_usage.py:234-239)."""
    parts = _with_time_parts(events)
    return {
        "country": _usage_by(parts, "countryCode"),
        "timezone": _usage_by(parts, "timeZone"),
    }


def write_usage_parquet(reports: dict[str, DataFrame], out_dir: str) -> None:
    """K2 sink: parquet, one directory per month — single write per report
    instead of the reference's per-month loop."""
    for name, df in reports.items():
        df.write.mode("overwrite").partitionBy("month").parquet(f"{out_dir}/{name}")
