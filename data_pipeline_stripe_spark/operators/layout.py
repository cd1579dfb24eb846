"""Physical data layout: clustered writes and small-file compaction.

The write-side half of the data-skipping story. `zorder_key_orders`
computes the clustering KEY; `write_clustered` is what a 100 TB table
maintenance job does with it: range-partition the rows on the key so
every output file owns a DISJOINT key span, and sort within each file so
parquet row-group min/max footers are tight. A reader's key-range
predicate then prunes whole files from the footer stats alone — the
engine-level equivalent of Delta/Iceberg OPTIMIZE ZORDER, with no table
format required (tests/test_scale_patterns.py reads the footers back
and pins the disjointness).

`compact_small_files` is the other maintenance verb: streaming ingest
(foreachBatch, per-trigger writes) accretes thousands of tiny files
whose per-file open/footer cost dominates scans at scale; compaction
rewrites a directory to size-targeted files. Both are plain DataFrame
jobs — distributed, restartable, no driver-side file juggling
(reference top10.py:260-278 writes per-day files in a driver loop).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_BUCKETED_BUILT: dict[tuple[str, str], tuple[str, int, str]] = {}


def write_bucketed_table(spark: SparkSession, df: DataFrame, table: str,
                         key: str, buckets: int = 8,
                         fingerprint: str | None = None) -> None:
    """Write ``df`` as a ``bucketBy(buckets, key).sortBy(key)`` catalog
    table, replacing any previous incarnation. Handles the
    LOCATION_ALREADY_EXISTS trap: a fresh session's in-memory catalog
    doesn't know tables a previous session wrote, but their warehouse
    directories persist — so both the catalog entry AND any orphaned
    warehouse directory are cleared before saveAsTable.

    ``fingerprint`` makes the layout write idempotent per session: when
    this session already built ``table`` with the SAME fingerprint and
    bucket count (and the catalog still has it), the rewrite is skipped.
    This is the warehouse reality at 100 TB — the bucketed layout is
    built ONCE by a maintenance job and amortized across every
    key-joining query; callers derive the fingerprint from the source
    files' identity (path+size+mtime) so a changed source still
    rebuilds. Scoped to the live session because the in-memory catalog
    dies with it."""
    import shutil
    from urllib.parse import urlparse

    app_id = spark.sparkContext.applicationId
    cache_key = (app_id, table)
    # schema is part of the identity: two callers writing the SAME table
    # name from the same sources but different projections must not
    # cross-serve each other's layout
    identity = (fingerprint, buckets, df.schema.simpleString())
    warehouse_dir = os.path.join(
        urlparse(spark.conf.get("spark.sql.warehouse.dir")).path, table)
    cached = _BUCKETED_BUILT.get(cache_key)
    if (fingerprint is not None
            and cached is not None and cached[0] == identity
            and spark.catalog.tableExists(table)
            # the catalog entry alone is not proof the layout survived:
            # an externally deleted/truncated warehouse dir would make
            # the skip serve a broken table — so completeness is checked
            # against the file count RECORDED at build time (ADVICE r9;
            # the write emits at most one file per bucket, but a bucket
            # that received zero rows writes none, so "== buckets" would
            # permanently miss on skewed/small fixtures and rebuild the
            # layout every call)
            and os.path.isdir(warehouse_dir)
            and sum(f.endswith(".parquet")
                    for f in os.listdir(warehouse_dir)) == cached[1]):
        return
    _BUCKETED_BUILT.pop(cache_key, None)
    # evict entries from dead sessions — the in-memory catalog they
    # describe died with their SparkContext
    for k in [k for k in _BUCKETED_BUILT if k[0] != app_id]:
        del _BUCKETED_BUILT[k]
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(warehouse_dir, ignore_errors=True)
    # repartition(buckets, key) uses the SAME Murmur3 hash bucketBy
    # uses, so each write task holds exactly one bucket → ONE file per
    # bucket. That's what lets the scan report its sortBy order (Spark
    # only trusts per-bucket order with a single file), which elides
    # the per-bucket Sort under every sort-merge join on the key — the
    # layout pays one extra shuffle ONCE, every join skips its sort
    # forever.
    (df.repartition(buckets, F.col(key))
     .write.bucketBy(buckets, key).sortBy(key)
     .mode("overwrite").saveAsTable(table))
    if fingerprint is not None:
        n_files = sum(f.endswith(".parquet")
                      for f in os.listdir(warehouse_dir))
        _BUCKETED_BUILT[cache_key] = (identity, n_files)


def source_fingerprint(sf_dir: str, tables: list[str]) -> str:
    """Identity of the parquet sources a derived layout was built from:
    realpath + per-file size and mtime of every data file. Any rewrite
    of a source table changes the fingerprint and forces a layout
    rebuild; an unchanged source lets the session reuse the table."""
    parts = [os.path.realpath(sf_dir)]
    for nm in tables:
        p = os.path.join(sf_dir, f"{nm}.parquet")
        files = (
            sorted(os.path.join(r, f)
                   for r, _d, fs in os.walk(p) for f in fs)
            if os.path.isdir(p) else [p]
        )
        for f in files:
            st = os.stat(f)
            parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def write_clustered(df: DataFrame, out_dir: str, cluster_cols: list[str],
                    n_files: int) -> None:
    """Write ``df`` as ``n_files`` parquet files with DISJOINT ranges of
    ``cluster_cols``: repartitionByRange gives non-overlapping spans
    (range exchange with sampled bounds), sortWithinPartitions makes
    row-group stats tight inside each file."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite").parquet(out_dir)
    )


def compact_small_files(spark: SparkSession, in_dir: str, out_dir: str,
                        target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Rewrite a parquet directory into ceil(total_bytes / target)
    files. Returns the output file count. Row content is preserved
    exactly; ordering is not (compaction is a layout operation, not a
    query). Source bytes are measured from a recursive directory walk
    (streaming sinks write partitioned subdirectories) — no data read
    happens on the driver. Note: partition-column VALUES survive (they
    come back as ordinary columns on read) but the directory layout is
    flattened; re-partition the output with write.partitionBy if the
    layout must be preserved."""
    src = os.path.realpath(in_dir)
    dst = os.path.realpath(out_dir)
    # mode("overwrite") clears the target BEFORE the lazy read executes:
    # compacting a directory onto itself (or onto a parent/child of
    # itself) would destroy the source mid-job.
    if src == dst or dst.startswith(src + os.sep) or src.startswith(dst + os.sep):
        raise ValueError(
            f"compact_small_files: out_dir {out_dir!r} overlaps in_dir "
            f"{in_dir!r} — overwrite would clear the source before the "
            f"read runs; compact into a sibling directory and swap")
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(in_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n = max(1, -(-total // target_file_bytes))
    spark.read.parquet(in_dir).repartition(n).write.mode(
        "overwrite").parquet(out_dir)
    return n


def vacuum_partitions(table_dir: str, partition_col: str,
                      keep) -> list[str]:
    """Retention for a directory-partitioned table: delete the partition
    directories whose value fails ``keep`` (a predicate on the decoded
    partition value). Purely a listing + directory delete — no Spark
    job, no data read; readers see the surviving partitions atomically
    per directory. Returns the deleted partition values (sorted).

    This is the poor-man's ``VACUUM``/retention of a lakehouse table:
    at 100 TB, expiring old days must be O(partitions-to-delete), never
    a rewrite of survivors. Values are compared as the STRING spelled in
    the directory name (partition-type inference is the repo's known
    trap) — pass a predicate over strings."""
    import shutil
    from urllib.parse import unquote

    prefix = f"{partition_col}="
    parts = [
        (unquote(e.name[len(prefix):]), e.path)
        for e in sorted(os.scandir(table_dir), key=lambda e: e.name)
        if e.is_dir() and e.name.startswith(prefix)
    ]
    doomed = [(v, p) for v, p in parts if not keep(v)]
    if parts and len(doomed) == len(parts):
        # a retention predicate that keeps NOTHING is almost always a
        # miscomputed cutoff (clock skew, off-by-one) — deleting every
        # partition leaves an unreadable table; make the caller say so
        # explicitly by deleting in two calls if truly intended
        raise ValueError(
            f"refusing to vacuum ALL {len(parts)} partitions of "
            f"{table_dir} — the keep predicate retained nothing")
    deleted = []
    for value, path in doomed:
        shutil.rmtree(path)
        deleted.append(value)
    return deleted
