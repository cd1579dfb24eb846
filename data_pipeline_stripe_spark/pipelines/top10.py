"""Report 1: daily top-K resources per category by purchase count.

Reference: top10.py — ingest (137-168), clean (62-83, 118-134, 171-192),
join events⟕resources⟕categories (227-236), count per (date, resource)
(239-241), join the count back (242-244), dense_rank per (date, category)
(247-250), keep rank<=10 (251), dedup (252), sort (253), then a per-date
driver loop issuing f-string SQL + one CSV write per date (260-278).

Rebuild:
- counts come from groupBy (date, resourceId) on the RAW events, BEFORE
  the dim joins — exactly the reference's count grain (top10.py:239-241).
  Counting after the joins would multiply events (and inflate counts)
  whenever a dim key is duplicated; pre-join counts make the count immune
  to dim duplication, and the post-join dedup on (date, categoryId,
  resourceId) (reference A4, top10.py:252) handles the ranked rows.
- the count-then-self-join becomes count-then-broadcast-dim-join: the
  fact shuffles once on (date, resourceId) and never joins itself.
- dims are broadcast (they are REST/Firestore-sized).
- the per-date loop is a single partitionBy("date") CSV write.
- dense_rank ties are KEPT (a "top 10" may exceed 10 rows) — that is the
  reference's semantic (top10.py:250-251), preserved deliberately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# The reference's categoryId zero-pad normalization "3.5" → "3.05"
# (top10.py:79-81 on categories, applied to resources too at
# royalties.py:88-90). Java regex supports the original lookahead form.
_DOT_PAD = (r"\.(?=\d)", ".0")


def normalize_category_id(col: F.Column) -> F.Column:
    return F.regexp_replace(col, *_DOT_PAD)


def top10_report(events: DataFrame, resources: DataFrame,
                 categories: DataFrame, k: int = 10) -> DataFrame:
    """events/resources/categories use the reference-domain schemas
    (schemas.EVENTS_RAW_SCHEMA etc.). Returns
    position|date|categoryId|categoryName|resourceId|resourceName|purchases
    (reference output schema, top10.py:10-24, plus the count)."""
    ev = events.select(
        F.substring("processTime", 1, 10).alias("date"),  # top10.py:184-185
        F.col("resourceId"),
    )
    # Dims deduped DETERMINISTICALLY on their key before the join: a
    # duplicate dim key (plausible after the '3.5'→'3.05' normalization
    # collides with a literal id) would otherwise make the later
    # dropDuplicates pick an arbitrary surviving name — run-over-run
    # flapping output. min(struct(...)) keeps the lexicographically
    # smallest payload, all fields from the SAME source row.
    res = F.broadcast(
        resources.select(
            F.col("id").alias("resourceId"),
            F.col("name").alias("resourceName"),
            normalize_category_id(F.col("categoryId")).alias("categoryId"),
        )
        .groupBy("resourceId")
        .agg(F.min(F.struct("resourceName", "categoryId")).alias("_s"))
        .select("resourceId", F.col("_s.resourceName").alias("resourceName"),
                F.col("_s.categoryId").alias("categoryId"))
    )
    cat = F.broadcast(
        categories.select(
            normalize_category_id(F.col("id")).alias("categoryId"),
            F.col("name").alias("categoryName"),
        )
        .groupBy("categoryId")
        .agg(F.min("categoryName").alias("categoryName"))
    )
    counts = (
        ev.groupBy("date", "resourceId")
        .agg(F.count("*").alias("purchases"))       # A1 top10.py:239-241 (pre-join)
    )
    enriched = (
        counts.join(res, "resourceId", "left")      # J1 top10.py:227-230
        .join(cat, "categoryId", "left")            # J2 top10.py:233-236
        .dropDuplicates(["date", "categoryId", "resourceId"])  # A4 :252
    )
    w = W.partitionBy("date", "categoryId").orderBy(F.col("purchases").desc())
    return (
        enriched.withColumn("position", F.dense_rank().over(w))  # W1 :247-250
        .filter(F.col("position") <= k)                          # P4 :251
        .select("position", "date", "categoryId", "categoryName",
                "resourceId", "resourceName", "purchases")
        .orderBy("date", "categoryId", "position")               # O1 :253
    )


def write_top10_csv(report: DataFrame, out_dir: str) -> None:
    """One job, one directory per date — replaces the reference's
    collect-distinct-dates + per-date loop + per-date CSV write
    (top10.py:260-278; K1 sink: header, '|' separator, overwrite).
    Clustered by the partition column before the write (guide §6):
    without it every task writes a sliver file into every date dir —
    up to tasks × dates tiny files for a top-K-per-day report."""
    (
        report.repartition("date").write.mode("overwrite")
        .partitionBy("date")
        .option("header", True)
        .option("sep", "|")
        .csv(out_dir)
    )
