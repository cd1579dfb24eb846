"""Mergeable distinct-count sketches: the pre-aggregated HLL table
pattern.

At 100 TB you do not re-scan the lake to answer "distinct users per
month/region/total" — you maintain a SMALL per-(fine-grain-key) table of
HyperLogLog sketch blobs and answer every coarser rollup by UNIONING
sketches (`hll_union_agg`), never touching raw data again. Spark ships
the Apache DataSketches HLL family as SQL functions (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate), so the partial state is an
ordinary binary column: persistable to parquet, mergeable across days,
engines, and ingest batches — the sketch twin of the exact
partial-state merge in ivm_merge_revenue_by_month.

DataSketches HLL is deterministic for a given input set and lgK, so
rolling up merged partials gives the BIT-IDENTICAL estimate the direct
coarse-grain sketch gives — pinned by tests/test_operators.py.

Reference parity: the reference's reports recount distincts from raw
events on every run (reference platform_usage.py full re-reads); this
is the operator that makes those counters incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partials(df: DataFrame, keys: list[str], col: str,
                 lgk: int = 12) -> DataFrame:
    """Per-key HLL sketch partials — the persisted incremental state.
    One row per key tuple with a binary ``hll`` sketch column (~2^lgk
    bytes max, independent of input size)."""
    return df.groupBy(*keys).agg(
        F.expr(f"hll_sketch_agg({col}, {lgk})").alias("hll")
    )


def hll_rollup(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Roll sketch partials up to a coarser grain by sketch union —
    no raw-data rescan. ``keys`` may be any subset of the partials'
    grouping (empty list = grand total)."""
    agg = F.expr(
        "hll_sketch_estimate(hll_union_agg(hll))"
    ).alias("approx_distinct")
    if keys:
        return partials.groupBy(*keys).agg(agg)
    return partials.agg(agg)


def hll_merge_partials(a: DataFrame, b: DataFrame,
                       keys: list[str]) -> DataFrame:
    """Merge two partial-sketch tables (e.g. yesterday's state + today's
    batch) into one — the incremental-ingest step. Union + one sketch
    union per key; output schema matches ``hll_partials``."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(F.expr("hll_union_agg(hll)").alias("hll"))
    )
