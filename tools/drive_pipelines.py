"""Verification drive: consume the package like a user — build the three
reference reports from raw-schema inputs, write them through the real
sinks, read the outputs back from disk."""

import subprocess
import sys
import tempfile

sys.path.insert(0, ".")

from data_pipeline_stripe_spark import pipelines, streaming
from data_pipeline_stripe_spark.schemas import (
    CATEGORIES_SCHEMA, COUNTRIES_SCHEMA, EVENTS_RAW_SCHEMA,
    EXCHANGE_RATES_SCHEMA, RESOURCES_SCHEMA,
)
from data_pipeline_stripe_spark.session import get_session

spark = get_session(master="local[4]")
spark.sparkContext.setLogLevel("ERROR")

events = spark.createDataFrame(
    [("e1", "2024-01-05T10:00:00+01:00", "2024-01-05T10:00:02", "r1", None, "US", 30, "100"),
     ("e2", "2024-01-06T11:00:00-05:00", "2024-01-06T11:00:01", "r1", None, "FR", 10, "200"),
     ("e3", "2024-02-01T09:00:00+01:00", "2024-02-01T09:00:05", "r2", None, "US", 5, "50")],
    EVENTS_RAW_SCHEMA)
resources = spark.createDataFrame(
    [("r1", "Res One", "3.5", "p1", "false"), ("r2", "Res Two", "7", "p2", "true")],
    RESOURCES_SCHEMA)
categories = spark.createDataFrame(
    [("t", "3.5", "Cat A", "10"), ("t", "7", "Cat B", "20")], CATEGORIES_SCHEMA)
countries = spark.createDataFrame(
    [("US", "USD", "United States"), ("FR", "EUR", "France")], COUNTRIES_SCHEMA)
rates = spark.createDataFrame([("USD", 1.0), ("EUR", 1.1)], EXCHANGE_RATES_SCHEMA)

out = tempfile.mkdtemp(prefix="pipeline_drive_", dir=".")

pipelines.write_top10_csv(pipelines.top10_report(events, resources, categories), f"{out}/top10")
pipelines.write_usage_parquet(pipelines.usage_report(events), f"{out}/usage")
pipelines.write_royalties_json(
    pipelines.royalties_report(events, resources, categories, countries, rates),
    f"{out}/royalties")

print("=== sink layout ===")
subprocess.run(["find", out, "-name", "*.csv", "-o", "-name", "*.json",
                "-o", "-name", "*.parquet", "-type", "f"], check=True)
print("=== top10 date=2024-01-05 ===")
subprocess.run(f"cat {out}/top10/date=2024-01-05/*.csv", shell=True, check=True)
print("=== royalties JSONL ===")
subprocess.run(f"cat {out}/royalties/*.json", shell=True, check=True)
print("=== usage (read back) ===")
for r in spark.read.parquet(f"{out}/usage/country").collect():
    print(r)
