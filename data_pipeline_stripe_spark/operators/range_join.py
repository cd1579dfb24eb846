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
               on: str | None = None, clock: str = "micros") -> DataFrame:
    """Returns left ⋈ right rows with |left_time - right_time| <=
    window_seconds (and equal ``on`` key if given). Column sets must be
    disjoint apart from ``on``.

    ``clock`` picks the comparison precision:

    - ``"micros"`` (default): exact — |Δt| measured on the true
      microsecond timestamps.
    - ``"seconds"``: both timestamps truncate to whole seconds FIRST
      (the declared semantics of range_join_cooccurring_events and its
      second-granular oracle). On sub-second data this admits pairs up
      to ~1 s outside the window — a property of the truncated clock,
      not a bug, but it must be chosen, not inherited silently.

    Buckets quantize at window granularity on the same clock, so every
    qualifying pair shares or neighbors a bucket and the equi-join
    stays complete."""
    if clock not in ("micros", "seconds"):
        raise ValueError(f"clock must be 'micros' or 'seconds', got {clock!r}")
    w = int(window_seconds)
    if clock == "micros":
        w_us = w * 1_000_000
        l_us = F.unix_micros(F.col(left_time))
        r_us = F.unix_micros(F.col(right_time))
    else:
        w_us = w
        l_us = F.unix_timestamp(F.col(left_time))
        r_us = F.unix_timestamp(F.col(right_time))
    l_bucket = F.floor(l_us / w_us)
    r_bucket = F.floor(r_us / w_us)
    l = left.withColumn(
        "_bucket",
        F.explode(F.array(l_bucket - 1, l_bucket, l_bucket + 1)),
    )
    r = right.withColumn("_bucket", r_bucket)
    keys = ["_bucket"] + ([on] if on else [])
    exact = F.abs(l_us - r_us) <= w_us
    return l.join(r, keys, "inner").filter(exact).drop("_bucket")
