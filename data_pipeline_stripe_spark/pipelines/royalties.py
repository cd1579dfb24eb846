"""Report 3: monthly royalties per provider, USD-normalized.

Reference: royalties.py — joins events⟕resources⟕categories (286-295),
⟕countries on countryCode==CountryCode (298), computes
amount = itemPrice * percent / 100 when promotion == "false" else 0 as a
comma-formatted STRING (231-233, format_number), then drops to the RDD
API (306): every row pickled to a Python worker, converted through a
closure-captured exchange-rate dict (convert_to_usd, 238-254 — USD rows
pass through, rows with unknown currency or null amount return None and
are filtered), pickled back, toDF(schema).

Rebuild:
- the rate dict becomes a broadcast-joined rates(code, rate) DataFrame;
  unknown currencies drop via the inner join + amount-null filter — the
  explicit form of the reference's None-filter semantics.
- amounts stay NUMERIC (round 2) through the pipeline; the reference's
  format_number string quirk is available as format_number_prices in the
  query registry but canonical output is typed (SURVEY.md §7.2 decision).
- no JVM→Python hop anywhere.

Output-grain decision (declared deviation): the reference's final select
(royalties.py:309-313) emits one row PER EVENT — month/providerId/
resourceId/amount with no aggregation, i.e. a converted per-event ledger
despite the script's own "monthly royalties per provider" purpose
(readme + the once-per-month scheduler note at royalties.py:320). The
rebuild implements the documented intent: SUM to (date, providerId).
The per-event ledger is `converted` just before the groupBy — callers
wanting the reference's literal row grain can stop there; the monthly
aggregate is what the report sink writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .top10 import normalize_category_id


def royalties_report(events: DataFrame, resources: DataFrame,
                     categories: DataFrame, countries: DataFrame,
                     rates: DataFrame) -> DataFrame:
    """Inputs use the reference-domain schemas (schemas.py §1); rates is
    the 2-column (code, rate) dim replacing the closure dict
    (royalties.py:210-214). Returns date|providerId|amount (USD)."""
    ev = events.select(
        F.substring("eventTime", 1, 7).alias("month"),   # royalties.py:193-194
        "resourceId", "countryCode", "itemPrice",
    )
    res = F.broadcast(
        resources.select(
            F.col("id").alias("resourceId"),
            normalize_category_id(F.col("categoryId")).alias("categoryId"),
            "providerId", "promotion",
        )
    )
    cat = F.broadcast(
        categories.select(
            normalize_category_id(F.col("id")).alias("categoryId"),
            "percent",
        )
    )
    ctry = F.broadcast(countries.select("CountryCode", "Code"))
    # rename the join key: Spark resolves case-insensitively by default, so
    # rates.code would collide with countries.Code after the join
    rts = F.broadcast(rates.select(F.col("code").alias("rate_code"), "rate"))

    joined = (
        ev.join(res, "resourceId", "left")                       # J1 :286-289
        .join(cat, "categoryId", "left")                         # J2 :292-295
        .join(ctry, ev.countryCode == ctry.CountryCode, "left")  # J8 :298
    )
    # amount in local currency: itemPrice * percent / 100 unless the
    # resource is promoted (string compare "false" — royalties.py:231-233;
    # itemPrice/percent are numeric STRINGS, cast explicitly where the
    # reference leaned on implicit coercion).
    local_amount = F.when(
        F.col("promotion") == "false",
        F.col("itemPrice").cast("double") * F.col("percent").cast("double") / 100.0,
    ).otherwise(0.0)
    # USD conversion via broadcast join: USD passes through at rate 1.0
    # (royalties.py:243-244); currencies missing from rates drop
    # (royalties.py:245-246 returns None → filtered at :306).
    converted = (
        joined.withColumn("local_amount", local_amount)
        .join(rts, F.col("Code") == F.col("rate_code"), "left")
        .withColumn(
            "usd_amount",
            F.when(F.col("Code") == "USD", F.col("local_amount"))
            .otherwise(F.col("local_amount") * F.col("rate")),
        )
        .filter(F.col("usd_amount").isNotNull())                 # P7 :306
    )
    return (
        converted.groupBy(F.col("month").alias("date"), "providerId")
        .agg(F.round(F.sum("usd_amount"), 2).alias("amount"))
    )


def write_royalties_json(report: DataFrame, out_dir: str) -> None:
    """K3 sink: JSON-lines, overwrite (royalties.py:317). Coalesced:
    a monthly-currency report is bounded-small (guide §6 file sizing —
    one JSONL file, not a sliver per shuffle partition)."""
    report.coalesce(1).write.mode("overwrite").json(out_dir)
