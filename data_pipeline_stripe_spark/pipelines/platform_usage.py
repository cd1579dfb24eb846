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


def _usage_by(events_parts: DataFrame, dim: str, relative_name: str) -> DataFrame:
    """One usage report at (month, dim, resourceId) grain with the
    reference's three measures (platform_usage.py:202-221):

    - ``usagePercentTotal``: the resource's whole-month share —
      totalDurationResource(month, resource) / totalDurationAll(month),
      computed as window sums over the aggregate (the reference's
      usage_percent_total_udf at :104-107 with the :118-141 denominators).
    - ``<relative_name>`` (usagePercentRelativeCountry / ...Tz): the
      resource's share within its (month, dim) group (:143-187).
    - ``totalDurationInSec``: totalDurationResource at (month, resource)
      grain (:208,219) — repeated across the dim values of that resource,
      exactly as the reference emits it.

    Still one shuffle of the fact (the finest-grain groupBy); all three
    denominators are window sums over the small aggregate."""
    per_key = (
        events_parts.groupBy("month", dim, "resourceId")
        .agg(F.sum("duration").alias("group_resource_duration"))
    )
    dur_resource = F.sum("group_resource_duration").over(
        W.partitionBy("month", "resourceId")
    )
    dur_all = F.sum("group_resource_duration").over(W.partitionBy("month"))
    dur_group = F.sum("group_resource_duration").over(W.partitionBy("month", dim))
    return per_key.select(
        "month",
        dim,
        "resourceId",
        F.round(dur_resource / dur_all * 100, 4).alias("usagePercentTotal"),
        F.round(
            F.col("group_resource_duration") / dur_group * 100, 4
        ).alias(relative_name),
        dur_resource.alias("totalDurationInSec"),
    )


def usage_report(events: DataFrame) -> dict[str, DataFrame]:
    """Returns {"country": df, "timezone": df} — the two reports the
    reference writes to country/ and timezone/ (platform_usage.py:234-239),
    with the reference's output schema (month, dim, resourceId,
    usagePercentTotal, usagePercentRelative*, totalDurationInSec)."""
    parts = _with_time_parts(events)
    return {
        "country": _usage_by(parts, "countryCode", "usagePercentRelativeCountry"),
        "timezone": _usage_by(parts, "timeZone", "usagePercentRelativeTz"),
    }


def write_usage_parquet(reports: dict[str, DataFrame], out_dir: str) -> None:
    """K2 sink: parquet, one directory per month — single write per report
    instead of the reference's per-month loop. Clustered by the
    partition column before the write (guide §6: one file per month
    instead of a sliver per task per month)."""
    for name, df in reports.items():
        df.repartition("month").write.mode("overwrite") \
            .partitionBy("month").parquet(f"{out_dir}/{name}")
