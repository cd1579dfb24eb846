"""Distributed Bloom filter as pure Spark expressions.

The filter is an ordinary (tiny) DataFrame — ``(word_idx, bits)`` long
pairs covering ``m_bits`` bits in 64-bit words — built with one grouped
``bit_or`` aggregation and probed scan-side. Nothing leaves the JVM:
positions are ``pmod(xxhash64(key, seed_i), m_bits)`` (k independent
seeds), so build and probe agree by construction and the same bitmap can
be persisted and reused across jobs.

Why this beats broadcasting the key set at 100 TB: a benchmark eval
split's distinct 8-gram set is tens of GB of strings (too big for a
broadcast), but its Bloom bitmap at ~10 bits/key is 2-3 orders of
magnitude smaller and CONSTANT-SIZE once sized for the target false-
positive rate. The probe side then pays the exact keyed join only for
the candidates the filter lets through (true matches + the configured
FP rate of the remainder), not for every probe row.

Probing is approximate (false positives, never false negatives), so
callers that need exactness follow the probe with an exact semi-join on
the surviving candidates — see ``llm.text.decontamination_bloom``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default geometry: 2^20 bits (16 Ki words = 128 KiB) and 4 probes holds
# ~100k keys at under 2% false positives; size m_bits ~10x key count for
# real corpora.
BLOOM_M_BITS = 1 << 20
BLOOM_K = 4


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of the key's k bit positions: pmod(xxhash64(key, seed), m).

    pmod, not % or abs(): xxhash64 spans the full signed-long range and
    both ``%`` and ``abs`` mishandle the negative half (abs(MIN_VALUE)
    is still negative on the JVM — the operators/skew.py lesson)."""
    return F.array(*[
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))
        for seed in range(k)
    ])


def bloom_build(keys: DataFrame, key_col: str = "key",
                m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> DataFrame:
    """Aggregate a key DataFrame into a Bloom bitmap DataFrame
    ``(word_idx long, bits long)``.

    One explode (k rows per key) + one grouped ``bit_or`` — a map-side-
    combinable aggregation whose output is at most ``m_bits / 64`` rows
    regardless of key count, so the bitmap is always broadcastable."""
    pos = F.explode(_positions(F.col(key_col), m_bits, k)).alias("_pos")
    return (
        keys.select(pos)
        .select(
            (F.col("_pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(_pos % 64 as int))").alias("_word"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_word").alias("bits"))
    )


def bloom_probe(df: DataFrame, key_col: str, bitmap: DataFrame,
                m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> DataFrame:
    """Filter ``df`` to rows whose ``key_col`` MAY be in the filter
    (false positives possible at the configured rate, false negatives
    never). Adds no columns; preserves the input schema.

    Shape: the sparse bitmap folds into ONE map row (at most
    ``m_bits/64`` entries) that rides a 1-row broadcast cross — the same
    scalar-subquery class as q22/doc_lm_score — and membership is a pure
    scan-side ``forall`` over the key's k positions with ``element_at``
    map lookups. The probe stream itself never shuffles, explodes, or
    re-groups: at 100 TB the filter runs at scan speed inside codegen
    and only survivors reach whatever keyed join follows."""
    # The internal position/bitmap columns must not shadow caller columns
    # (withColumn would silently REPLACE an existing "_ps", then drop()
    # would delete the caller's column). Derive names that provably don't
    # collide with the probe schema instead of reserving fixed ones.
    taken = set(df.columns)
    ps_col, bm_col = "_ps", "_bm"
    while ps_col in taken:
        ps_col += "_"
    while bm_col in taken or bm_col == ps_col:
        bm_col += "_"
    one_row = bitmap.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "bits"))
        ).alias(bm_col)
    )
    member = F.expr(
        f"forall({ps_col}, p -> (coalesce(element_at({bm_col},"
        " cast(p / 64 as bigint)), 0L)"
        " & shiftleft(1L, cast(p % 64 as int))) != 0)"
    )
    return (
        df.withColumn(ps_col, _positions(F.col(key_col), m_bits, k))
        .join(F.broadcast(one_row))
        .filter(member)
        .drop(ps_col, bm_col)
    )
