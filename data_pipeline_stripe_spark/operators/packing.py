"""Token-budget shard packing via a distributed two-phase prefix sum.

Training pipelines shard a corpus into files of ~N tokens each, in a
deterministic document order. The defining computation is a GLOBAL
running sum of token counts — and the naive Spark spelling,
``SUM(w) OVER (ORDER BY k)`` with no partition clause, plans as an
``Exchange SinglePartition``: every row through ONE task. Fine at 60k
rows, dead at 100 TB.

The scale shape used here is the classic two-phase scan:

1. range-bucket rows by the order key (monotonic bucketing, so bucket
   order == key order);
2. per-bucket totals → a B-row frame; the running OFFSET of each bucket
   is a window over those B rows (the only single-partition exchange
   left, and it carries B rows, not the corpus);
3. broadcast the offsets back and finish with a window PARTITIONED BY
   bucket — each bucket's cumsum runs in its own task.

Result is bit-identical to the naive global window (the oracle states it
as one). Bucketing here divides the key's [min, max] span into equal
ranges (two tiny agg jobs); for arbitrarily skewed or non-numeric keys,
swap step 1 for sampled range boundaries exactly as Spark's
RangePartitioner does — steps 2–3 are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def global_running_sum(df: DataFrame, order_col: str, weight_col: str,
                       n_buckets: int = 256,
                       out_col: str = "running_total") -> DataFrame:
    """Exact inclusive prefix sum of ``weight_col`` over rows ordered by
    ``order_col`` (a numeric key, unique per row), without ever shuffling
    the full dataset to one partition."""
    lo, hi = df.agg(
        F.min(order_col).cast("double"), F.max(order_col).cast("double")
    ).first()
    # the running-total type is whatever SUM(weight) yields — long for
    # integral weights, double for fractional; the empty branch must
    # agree or the schema flips across the empty boundary (a no-data day
    # would break unionByName with every other day)
    sum_type = ("bigint" if df.schema[weight_col].dataType.simpleString()
                in ("tinyint", "smallint", "int", "bigint") else "double")
    if lo is None:
        if df.isEmpty():  # keep the schema, add the column
            return df.withColumn(out_col, F.lit(None).cast(sum_type))
        lo = hi = 0.0  # all keys NULL: everything lands in bucket 0
    span = max((hi - lo + 1.0) / n_buckets, 1.0)
    # NULL keys go to bucket 0 EXPLICITLY: the naive global window sorts
    # nulls first (asc default), and the per-bucket window below does the
    # same within bucket 0 — whereas least(NULL, b) would return b (least
    # skips nulls on the JVM) and silently shove every NULL-key row into
    # the LAST bucket.
    bucketed = df.withColumn(
        "_bucket",
        F.when(F.col(order_col).isNull(), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col(order_col) - F.lit(lo)) / F.lit(span)),
                F.lit(n_buckets - 1),
            )
        )
        .cast("long"),
    )
    # B-row frame of bucket totals; running offset = sum of PRIOR buckets.
    per_bucket = bucketed.groupBy("_bucket").agg(
        F.sum(weight_col).alias("_bucket_total")
    )
    woff = W.orderBy("_bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bucket",
        F.coalesce(F.sum("_bucket_total").over(woff), F.lit(0)).alias("_offset"),
    )
    win = W.partitionBy("_bucket").orderBy(order_col) \
           .rowsBetween(W.unboundedPreceding, 0)
    return (
        bucketed.join(F.broadcast(offsets), "_bucket")
        .withColumn(out_col, F.col("_offset") + F.sum(weight_col).over(win))
        .drop("_bucket", "_offset")
    )


def global_row_number(df: DataFrame, order_cols: list,
                      n_buckets: int = 256,
                      out_col: str = "rn") -> DataFrame:
    """Exact global ROW_NUMBER over ``order_cols`` (strings or Column
    expressions — e.g. ``F.col("x").desc()``; the combination must be a
    TOTAL order, i.e. no ties, or the numbering is nondeterministic
    exactly as the naive global window's would be) without the
    ``Exchange SinglePartition`` the naive ``ROW_NUMBER() OVER (ORDER
    BY ...)`` plans. Same two-phase shape as ``global_running_sum``,
    generalized to arbitrary multi-column orderings via
    ``repartitionByRange`` (Spark's RangePartitioner samples split
    points, so bucket id order == key order by construction — no
    numeric-span math, no skew cliff):

    1. range-partition on the order columns; capture the partition id
       (monotone in the ordering) IN the same stage;
    2. per-partition local row_number (each bucket sorts in its own
       task) + per-partition counts → a B-row offsets frame (the only
       single-partition window left, over B rows);
    3. broadcast the offsets back: global rn = offset + local rn."""
    return _global_rn_with_total(df, order_cols, n_buckets, out_col) \
        .drop("_total")


def _global_rn_with_total(df: DataFrame, order_cols: list,
                          n_buckets: int, out_col: str) -> DataFrame:
    """The two-phase core: global row number in ``out_col`` PLUS the
    total row count in ``_total`` — both derived from the SAME B-row
    per-bucket counts frame inside one plan (``_off`` is the running
    sum over preceding buckets, ``_total`` the sum over all buckets,
    computed in the one O(B) single-partition window), so a
    nondeterministic input cannot make the total disagree with the
    ranking and the input is scanned once (ADVICE r11)."""
    from pyspark.sql import functions as F

    part = df.repartitionByRange(n_buckets, *order_cols)
    pid = part.withColumn("_pid", F.spark_partition_id())
    w_local = W.partitionBy("_pid").orderBy(*order_cols)
    local = pid.withColumn("_lrn", F.row_number().over(w_local))
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    woff = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    wall = W.orderBy("_pid").rowsBetween(W.unboundedPreceding,
                                         W.unboundedFollowing)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"),
        F.sum("_n").over(wall).alias("_total"))
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def global_ntile(df: DataFrame, order_cols: list, n_tiles: int,
                 n_buckets: int = 256,
                 out_col: str = "tile") -> DataFrame:
    """Exact global NTILE(n) over a total ordering, bit-identical to
    ``NTILE(n) OVER (ORDER BY ...)`` but built on the two-phase
    ``global_row_number`` — so a quartile/decile assignment over a
    100 TB table never funnels through one task. NTILE's exact spec:
    with N rows, the first ``N % n`` tiles get ``N // n + 1`` rows,
    the rest ``N // n`` — computed from the global row number with
    integer arithmetic (the repo numeric policy: no double rounding
    in rank math)."""
    from pyspark.sql import functions as F

    # _total rides in from the SAME per-bucket counts frame the ranking
    # uses (one plan, one scan, one O(B) window) — not a separate
    # df.count() action, which would re-evaluate a nondeterministic
    # input and could disagree with the ranked frame, yielding wrong or
    # out-of-range tiles (ADVICE r11).
    with_total = _global_rn_with_total(df, order_cols, n_buckets,
                                       out_col="_grn")
    # NTILE's exact spec in integer arithmetic (no double rounding —
    # DIV, never '/'): base = N div n, rem = N % n; the first rem tiles
    # get base+1 rows. With base == 0 (fewer rows than tiles) tile = rn.
    base = F.expr(f"_total div {n_tiles}")
    rem = F.expr(f"_total % {n_tiles}")
    big_expr = f"((_total div {n_tiles}) + 1)"
    tile = F.when(base == F.lit(0), F.col("_grn")) \
        .when(F.col("_grn") <= rem * F.expr(big_expr),
              F.expr(f"(_grn + (_total div {n_tiles})) div {big_expr}")) \
        .otherwise(F.expr(
            f"(_total % {n_tiles}) + "
            f"(_grn - (_total % {n_tiles}) * {big_expr} "
            f"+ (_total div {n_tiles}) - 1) div (_total div {n_tiles})"))
    return (with_total.withColumn(out_col, tile.cast("long"))
            .drop("_grn", "_total"))


def assign_token_shards(df: DataFrame, order_col: str, weight_col: str,
                        target_weight: int,
                        n_buckets: int = 256) -> DataFrame:
    """Assign each row the id of the ~``target_weight``-token shard it
    starts in: shard_id = (prefix_sum_before_this_row) div target.
    Documents are never split; a shard overshoots by at most one document
    (standard packing behavior). Deterministic given the order key."""
    cum = global_running_sum(df, order_col, weight_col, n_buckets,
                             out_col="_cum")
    # integer division, not floor(double /): beyond ~2^52 cumulative
    # tokens the long->double round-trip mis-places boundary documents —
    # non-reproducibly. Weights here are integral (token counts) so the
    # prefix sum is long; `div` keeps the whole computation in integers
    # (repo numeric policy).
    return (
        cum.withColumn(
            "shard_id",
            F.expr(f"(_cum - {weight_col}) div {target_weight}")
            .cast("long"),
        )
        .drop("_cum")
    )
