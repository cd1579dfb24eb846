"""Slowly-changing-dimension (type 2) build from a change log.

The classic warehouse operator the reference stack's Firestore-snapshot
reads sidestep (reference top10.py:87-114 re-reads the whole collection
each run, so history is lost): given a stream of observed attribute
states per key, produce the versioned dimension — one row per (key,
distinct consecutive state) with [valid_from, valid_to) validity and an
is_current flag.

Scale shape: ONE shuffle (the per-key window); consecutive-duplicate
collapse and validity intervals are lag/lead over that same partitioning,
so adding SCD2 history to a 100 TB change log costs exactly one
exchange. Deterministic: same-timestamp changes order by the caller's
tiebreak column.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def scd2_from_changes(changes: DataFrame, key: str, ts: str,
                      attrs: list[str], tiebreak: str) -> DataFrame:
    """Type-2 SCD from a change log ``(key, ts, attrs..., tiebreak)``.

    A change row opens a new version only when its attribute tuple
    differs from the key's previous observation (NULL-safe comparison);
    repeated observations of the same state collapse into the earlier
    version. Each version is valid from its first observation until the
    next version's ``valid_from`` (NULL for the current version).
    Returns (key, attrs..., valid_from, valid_to, version, is_current).
    """
    w = W.partitionBy(key).orderBy(ts, tiebreak)
    same_as_prev = functools.reduce(operator.and_, [
        F.col(a).eqNullSafe(F.lag(a).over(w)) for a in attrs
    ])
    kept = (
        changes.withColumn("_rn", F.row_number().over(w))
        .withColumn("_same", same_as_prev)
        .filter((F.col("_rn") == 1) | ~F.col("_same"))
    )
    wv = W.partitionBy(key).orderBy(ts, tiebreak)
    return (
        kept.select(
            key, *attrs,
            F.col(ts).alias("valid_from"),
            F.lead(ts).over(wv).alias("valid_to"),
            F.row_number().over(wv).cast("long").alias("version"),
            F.lead(ts).over(wv).isNull().alias("is_current"),
        )
    )
