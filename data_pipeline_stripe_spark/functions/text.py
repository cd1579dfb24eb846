"""Reusable text column expressions (JVM-side, no Python UDFs).

All tokenization is defined to be reproducible in ANSI SQL so every text
operator can be oracle-checked: tokens = whitespace split of trimmed text;
shingles = space-joined runs of 3 consecutive tokens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SHINGLE_WIDTH = 3


def normalized_text_expr(col: Column | str) -> Column:
    """Canonical normalization used by exact dedup: lower(trim(text))."""
    return F.lower(F.trim(F.col(col) if isinstance(col, str) else col))


def tokens_expr(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text (matches DuckDB
    string_split_regex(trim(text), '\\s+'))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def shingles_expr(tokens: Column, width: int = SHINGLE_WIDTH) -> Column:
    """Array of width-token shingles (1-indexed element_at, so the result
    matches DuckDB's `[t[i]||' '||...  for i in range(1, len(t)-w+2)]`).
    Caller must guarantee size(tokens) >= width (filter first)."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (width - 1))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + off) for off in range(width)]
        ),
    )
