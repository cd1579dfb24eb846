"""The snapshot table as a Spark STREAMING SOURCE (Python DataSource).

The sink side of the loop is proven by the epoch-keyed idempotent
commit (stream_snapshot_sink_parity); this module closes the loop: a
downstream job subscribes to a snapshot table and receives each new
APPEND as a micro-batch — the Delta-source pattern where the streaming
offset IS the table version. The driver side only walks manifests
(version → file-entry set difference, the same O(delta) chain walk as
``snapshot_read_incremental``); every data file becomes one
``InputPartition`` whose rows are read INSIDE an executor task as
Arrow record batches (no driver data path, no per-row Python cost).

Offsets are ``{"version": N}`` with -1 meaning "nothing consumed yet"
(the first batch serves the whole current version — Delta's
startingVersion=0 behavior). Restart recovery is structural: Spark
checkpoints the version offsets, and a replayed ``partitions(start,
end)`` recomputes the identical file set from the immutable manifests.

Contract: the consumed range must be APPEND-ONLY (an overwrite/rewrite
in range raises — exactly Delta's streaming-source rule for non-append
commits without ``skipChangeCommits``), and versions must not be
expired past the checkpoint (raises with the retention hint).
Cluster note: manifests are read where the driver-side Python worker
runs, data files where executors run — on a real cluster ``path`` must
be shared storage (which a table format's location always is).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class SnapshotFileSlice(InputPartition):
    def __init__(self, abs_path: str | None, columns: list[str]):
        self.abs_path = abs_path
        self.columns = columns


def _delta_entries(table_dir: str, start_v: int, end_v: int) -> list[dict]:
    """File entries ADDED in (start_v, end_v] — ``start_v == -1`` means
    the full file set of ``end_v`` (initial load). Append-only chain
    walk; raises ValueError on an overwrite/rewrite or expired version
    in range (the caller must restart from a full re-read)."""
    from ..operators.snapshots import _read_manifest

    try:
        end_m = _read_manifest(table_dir, end_v)
        if start_v < 0:
            return list(end_m["files"])
        v = end_v
        while v is not None and v > start_v:
            m = _read_manifest(table_dir, v)
            if m["mode"] != "append":
                raise ValueError(
                    f"snapshot stream source: version {v} of {table_dir} "
                    f"is a {m['mode']} — the offset range has no "
                    "append-only delta; restart the stream from a fresh "
                    "checkpoint (full re-read)")
            v = m["parent"]
        if v != start_v:
            raise ValueError(
                f"snapshot stream source: offset version {start_v} is "
                f"not an ancestor of {end_v} on {table_dir}")
        base = {e["path"]
                for e in _read_manifest(table_dir, start_v)["files"]}
        return [e for e in end_m["files"] if e["path"] not in base]
    except FileNotFoundError as exc:
        raise ValueError(
            f"snapshot stream source: the offset range ({start_v}, "
            f"{end_v}] of {table_dir} touches an expired version — "
            "widen snapshot_expire retention past the consumer's "
            "checkpoint lag") from exc


class SnapshotTableStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError(
                "snapshot stream source: pass the table directory as "
                ".load(<path>) / option('path', ...)")
        self.columns = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        from ..operators.snapshots import snapshot_current_version

        v = snapshot_current_version(self.table_dir)
        return {"version": -1 if v is None else v}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["version"]), int(end["version"])
        if e < 0 or e <= s:
            return [SnapshotFileSlice(None, self.columns)]
        entries = _delta_entries(self.table_dir, s, e)
        if not entries:
            return [SnapshotFileSlice(None, self.columns)]
        return [
            SnapshotFileSlice(os.path.join(self.table_dir, en["path"]),
                              self.columns)
            for en in entries
        ]

    def read(self, partition: SnapshotFileSlice):
        if partition.abs_path is None:
            return
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.abs_path)
        for batch in pf.iter_batches(columns=partition.columns):
            # select() pins the declared column ORDER — parquet files
            # may store columns in a different physical order
            yield batch.select(partition.columns)

    def commit(self, end: dict) -> None:
        pass


class SnapshotTableDataSource(DataSource):
    """``spark.readStream.format("snapshot_table").load(<table_dir>)``.
    The schema is the CURRENT manifest's committed schema, resolved once
    at stream start; the consumed range must not evolve columns
    mid-stream (an evolved file would batch-mismatch — restart the
    stream to pick up the widened schema)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self):
        import json

        from pyspark.sql.types import StructField, StructType

        from ..operators.snapshots import (_read_manifest,
                                           snapshot_current_version)

        table_dir = self.options.get("path")
        if not table_dir:
            raise ValueError(
                "snapshot stream source: pass the table directory as "
                ".load(<path>)")
        v = snapshot_current_version(table_dir)
        if v is None:
            raise ValueError(
                f"snapshot stream source: {table_dir} has no commits")
        committed = StructType.fromJson(
            json.loads(_read_manifest(table_dir, v)["schema"]))
        return StructType([StructField(f.name, f.dataType, True)
                           for f in committed.fields])

    def streamReader(self, schema) -> SnapshotTableStreamReader:
        return SnapshotTableStreamReader(self.options, schema)


def register_snapshot_source(spark) -> None:
    """Idempotent registration (sessions are reused across queries)."""
    try:
        spark.dataSource.register(SnapshotTableDataSource)
    except Exception:
        pass
