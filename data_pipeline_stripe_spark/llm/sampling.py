"""Deterministic domain-mixture resampling — the training-corpus verb
behind published mixture recipes (The Pile's per-source weights, DoReMi's
reweighted sampling): draw an exact-size sample whose per-source counts
hit integer target quotas proportional to caller-declared weights.

Two exact building blocks compose (no randomness, no float shares):

1. **Quotas** via Hamilton largest-remainder apportionment
   (:func:`..operators.allocate.allocate_proportional`): integer quotas
   that sum EXACTLY to ``k`` — ``round(k·w/W)`` drifts by units and the
   drift direction is float-rounding dependent.
2. **Selection** within each source by md5 rank: documents order by
   ``md5(CAST(id AS VARCHAR))`` (tie-broken by id), and the first
   ``quota`` rows win. md5 of the decimal string is engine-independent,
   so the same documents are chosen on any engine, any partitioning,
   any day — resampling a grown corpus keeps prior picks stable except
   where new docs genuinely out-hash old ones.

Scale shape: one count-by-source aggregate (tiny), the quota math on
the #sources-row frame, one broadcast join of quotas back to the
corpus, and one per-source window rank — a single fact shuffle on
``source_col``. A skewed source holds all its rows on one reducer for
the rank; for 100 TB corpora pre-aggregate the rank with a per-partition
top-``quota`` prefilter (the pareto prefilter pattern) before the
global window — quota rows per source survive, so the global rank sees
O(#partitions·quota), not the source.

Reference scope: beyond the reference (X-surface) — its ETL has no
sampling verb at all; this is the LLM-data-pipeline extension SURVEY.md
§2.13 calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators._names import free_name, reject_reserved
from ..operators.allocate import allocate_proportional
from ..sources.readers import inline_dim


def mixture_resample(docs: DataFrame, weights: DataFrame, k: int,
                     source_col: str = "source",
                     id_col: str = "doc_id") -> DataFrame:
    """Select exactly ``k`` rows of ``docs`` with per-source counts
    Hamilton-apportioned to ``weights`` (a small ``(source_col, weight)``
    frame, BIGINT weights ≥ 0; sources missing from ``weights`` drop —
    inner-join semantics, the mixture recipe IS the allow-list).

    Adds ``pick_order`` (1-based md5 rank within the source) to the
    selected rows. Preconditions, both validated eagerly on the
    #sources-row quota frame (fail-loud beats silently under-filling the
    mixture; callers that want spillover redistribution should shrink
    ``k`` or reweight): every quota ≤ the source's row count, and the
    recipe's total weight > 0 (an all-zero recipe allocates nothing —
    "exactly k" would be a lie).

    The validation collect doubles as the quota materialization: the
    returned plan joins a literal #sources-row quota frame, so executing
    it scans the corpus ONCE (the selection join) — the count-by-source
    aggregate ran during construction, never again per execution.
    """
    reject_reserved(docs.columns, ["pick_order"], "mixture_resample")
    taken = set(docs.columns) | set(weights.columns)
    n_c, grp_c, q_c = (free_name(taken, b) for b in ("_n", "_g", "_quota"))

    counts = docs.groupBy(source_col).agg(F.count("*").alias(n_c))
    srcs = counts.join(F.broadcast(weights), source_col).withColumn(
        grp_c, F.lit(1)
    )
    quota_rows = (
        allocate_proportional(srcs, [grp_c], source_col, "weight", int(k))
        .withColumnRenamed("alloc_units", q_c)
        .select(source_col, n_c, q_c, "weight")
        .collect()
    )
    if sum(r["weight"] for r in quota_rows) <= 0:
        raise ValueError(
            "mixture_resample: the recipe's total weight is 0 — nothing "
            "can be allocated; give at least one source a positive weight")
    over = {r[source_col]: (r[q_c], r[n_c])
            for r in quota_rows if r[q_c] > r[n_c]}
    if over:
        raise ValueError(
            f"mixture_resample: quota exceeds available rows for {over} "
            f"(quota, available) — lower k or the source's weight")
    # The quota frame's source column must carry the CORPUS's type (an
    # integer source id hardcoded as string would silently type-coerce —
    # or fail — at the selection join). JVM VALUES form: a local list
    # through createDataFrame costs seconds of Python tasks per
    # materialization on a wide local master (sources/readers.inline_dim).
    quotas = inline_dim(
        docs.sparkSession,
        [(r[source_col], r[q_c]) for r in quota_rows],
        f"{source_col} {docs.schema[source_col].dataType.simpleString()}, "
        f"{q_c} bigint",
    )

    # Distributed prefilter (the pareto-prefilter pattern): rank per
    # (source, physical partition) FIRST and keep each partition's top
    # `quota` — provably safe because the global md5 order restricted to
    # one partition is the partition's md5 order, so a row outside its
    # partition's top-quota has ≥ quota partition-mates ahead of it
    # globally and can never be picked. A skewed source then feeds the
    # single-reducer global rank O(partitions·quota) rows, not its
    # whole extent.
    md5_rank = (F.md5(F.col(id_col).cast("string")), F.col(id_col))
    part_c = free_name(taken | {q_c}, "_part")
    pre_w = W.partitionBy(source_col, F.col(part_c)).orderBy(*md5_rank)
    rank_w = W.partitionBy(source_col).orderBy(*md5_rank)
    return (
        docs.join(F.broadcast(quotas), source_col)
        .withColumn(part_c, F.spark_partition_id())
        .withColumn("pick_order", F.row_number().over(pre_w).cast("long"))
        .filter(F.col("pick_order") <= F.col(q_c))
        .drop(part_c)
        .withColumn("pick_order", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("pick_order") <= F.col(q_c))
        .drop(q_c)
    )


def mixture_resample_oracle_sql(docs_sql: str, weights_sql: str, k: int,
                                source_col: str = "source",
                                id_col: str = "doc_id",
                                select: str = "*") -> str:
    """DuckDB transcription of :func:`mixture_resample`: the quota math
    COMPOSES :func:`..operators.allocate.allocate_proportional_oracle_sql`
    (the single source of truth for the Hamilton transcription — an
    earlier inline copy drifted by dropping its wsum>0 guard), then the
    same md5-rank selection."""
    from ..operators.allocate import allocate_proportional_oracle_sql

    inner = f"""
        SELECT c.{source_col}, w.weight, 1 AS grp
        FROM (SELECT {source_col} FROM ({docs_sql}) GROUP BY 1) c
        JOIN ({weights_sql}) w USING ({source_col})
    """
    quota_sql = allocate_proportional_oracle_sql(
        inner, keys="grp", id_col=source_col, weight_col="weight",
        total=int(k), select=source_col, out_col="quota",
    )
    return f"""
    WITH quota AS ({quota_sql}),
    ranked AS (
        SELECT d.*, q.quota,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY d.{source_col}
                   ORDER BY md5(CAST(d.{id_col} AS VARCHAR)), d.{id_col})
                   AS BIGINT) AS pick_order
        FROM ({docs_sql}) d JOIN quota q USING ({source_col})
    )
    SELECT {select}
    FROM ranked WHERE pick_order <= quota
    """
