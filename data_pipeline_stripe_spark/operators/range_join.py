"""Range (interval-proximity) join: pairs (l, r) with
|l.time - r.time| <= window, optionally within an equi key.

Spark plans a raw inequality join as a nested-loop — O(n·m). The scale
path implemented here is bucketization: quantize both sides to
window-sized buckets, replicate the LEFT side into its bucket and the two
adjacent ones, equi-join on the bucket id, and filter the exact
predicate. Every candidate pair shares a bucket (|Δt| <= w ⇒ bucket ids
differ by at most 1), so the equi-join finds all of them, the shuffle is
keyed, and the cross product never materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(left: DataFrame, right: DataFrame, left_time: str,
               right_time: str, window_seconds: int,
               on: str | None = None) -> DataFrame:
    """Returns left ⋈ right rows with |left_time - right_time| <=
    window_seconds (and equal ``on`` key if given). Column sets must be
    disjoint apart from ``on``."""
    w = int(window_seconds)
    l_bucket = F.floor(F.unix_timestamp(F.col(left_time)) / w)
    r_bucket = F.floor(F.unix_timestamp(F.col(right_time)) / w)
    l = left.withColumn(
        "_bucket",
        F.explode(F.array(l_bucket - 1, l_bucket, l_bucket + 1)),
    )
    r = right.withColumn("_bucket", r_bucket)
    keys = ["_bucket"] + ([on] if on else [])
    exact = (
        F.abs(F.unix_timestamp(F.col(left_time)) - F.unix_timestamp(F.col(right_time)))
        <= w
    )
    return l.join(r, keys, "inner").filter(exact).drop("_bucket")
