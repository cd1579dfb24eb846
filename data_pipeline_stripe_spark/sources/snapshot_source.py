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

``option("cdf", "true")`` switches the source to the CHANGE DATA FEED
(Delta's ``readChangeFeed``): each micro-batch serves row-level
changes — appends as 'I' rows, merge/CDC commits via their recorded
change logs (including 'D' rows with pre-delete values), compactions
as zero rows — with ``_change_type`` and ``_commit_version`` columns
appended to the table schema. A CDF stream therefore SURVIVES the
rewrite commits that stop the plain source: downstream state stays
incremental across a MERGE. Only a plain overwrite (no recorded log)
still raises. ``option("startingVersion", N)`` starts the feed at
version N's changes (default 0 = the initial commit's rows as 'I').
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
    def __init__(self, abs_path: str | None, columns: list[str],
                 kind: str = "data", version: int = -1,
                 schema_json: str | None = None):
        self.abs_path = abs_path
        self.columns = columns
        # CDF fields: kind 'data' (append delta — synthesize 'I') or
        # 'log' (recorded change-log file — _change_type comes from the
        # file); version stamps _commit_version; schema_json carries the
        # declared output schema so executors build exact Arrow batches
        self.kind = kind
        self.version = version
        self.schema_json = schema_json


def _delta_entries(table_dir: str, start_v: int, end_v: int) -> list[dict]:
    """File entries ADDED in (start_v, end_v] — ``start_v == -1`` means
    the full file set of ``end_v`` (initial load, no history walk).
    Append-only classification over the SHARED chain walk
    (``_manifest_chain`` — one place owns the expired/ancestor
    contract); raises ValueError on an overwrite/rewrite in range (the
    caller must restart from a full re-read)."""
    from ..operators.snapshots import _manifest_chain, _read_manifest

    if start_v < 0:
        try:
            return list(_read_manifest(table_dir, end_v)["files"])
        except FileNotFoundError as exc:
            raise ValueError(
                f"snapshot stream source: version {end_v} of {table_dir} "
                "is expired — widen snapshot_expire retention past the "
                "consumer's checkpoint lag") from exc
    chain = _manifest_chain(table_dir, start_v, end_v,
                            "snapshot stream source")
    for m in chain[1:]:
        if m["mode"] != "append":
            raise ValueError(
                f"snapshot stream source: version {m['version']} of "
                f"{table_dir} is a {m['mode']} — the offset range has "
                "no append-only delta; restart the stream from a fresh "
                "checkpoint (full re-read)")
    base = {e["path"] for e in chain[0]["files"]}
    return [e for e in chain[-1]["files"] if e["path"] not in base]


def _cdf_slices(table_dir: str, start_v: int, end_v: int) -> list[tuple]:
    """(rel_path, kind, version) change slices for the feed over
    ``(start_v, end_v]`` — ``start_v == -1`` includes version 0's
    initial commit as 'I' rows. Appends contribute their delta data
    files (kind 'data'); rewrites contribute their recorded change-log
    files (kind 'log' — empty log = compaction = nothing); a rewrite
    with NO recorded log (plain overwrite) raises, Delta's own CDF
    rule."""
    from ..operators.snapshots import _manifest_chain

    chain = _manifest_chain(table_dir, start_v, end_v,
                            "snapshot CDF source")
    # pair each in-range manifest with its parent (the range anchor /
    # root has none): appends need the parent file set for their delta
    nodes = (list(zip([None] + chain[:-1], chain)) if start_v < 0
             else list(zip(chain, chain[1:])))
    slices: list[tuple] = []
    for parent_m, m in nodes:
        v = m["version"]
        if m["mode"] == "append":
            base = ({e["path"] for e in parent_m["files"]}
                    if parent_m is not None else set())
            slices.extend(
                (e["path"], "data", v) for e in m["files"]
                if e["path"] not in base)
        else:
            entries = m.get("changes")
            if entries is None:
                raise ValueError(
                    f"snapshot CDF source: version {v} of {table_dir} "
                    f"is a {m['mode']} with no recorded change log — "
                    "its delta is not expressible; restart the "
                    "consumer from a full re-read")
            slices.extend((e["path"], "log", v) for e in entries)
    return slices


class SnapshotTableStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError(
                "snapshot stream source: pass the table directory as "
                ".load(<path>) / option('path', ...)")
        self.columns = [f.name for f in schema.fields]
        self.cdf = str(options.get("cdf", "false")).lower() == "true"
        self.schema_json = schema.json()
        start = int(options.get("startingVersion", 0))
        self._initial = start - 1

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        from ..operators.snapshots import snapshot_current_version

        v = snapshot_current_version(self.table_dir)
        return {"version": -1 if v is None else v}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["version"]), int(end["version"])
        if e < 0 or e <= s:
            return [SnapshotFileSlice(None, self.columns)]
        if self.cdf:
            slices = _cdf_slices(self.table_dir, s, e)
            if not slices:
                return [SnapshotFileSlice(None, self.columns)]
            return [
                SnapshotFileSlice(os.path.join(self.table_dir, rel),
                                  self.columns, kind=kind, version=v,
                                  schema_json=self.schema_json)
                for (rel, kind, v) in slices
            ]
        entries = _delta_entries(self.table_dir, s, e)
        if not entries:
            return [SnapshotFileSlice(None, self.columns)]
        return [
            SnapshotFileSlice(os.path.join(self.table_dir, en["path"]),
                              self.columns, schema_json=self.schema_json)
            for en in entries
        ]

    def read(self, partition: SnapshotFileSlice):
        if partition.abs_path is None:
            return
        import pyarrow.parquet as pq

        if partition.schema_json is None:
            # legacy slice shape (no declared schema carried) — exact-
            # generation files only
            pf = pq.ParquetFile(partition.abs_path)
            for batch in pf.iter_batches(columns=partition.columns):
                # select() pins the declared column ORDER — parquet files
                # may store columns in a different physical order
                yield batch.select(partition.columns)
            return
        # Aligned read — build Arrow batches in the declared schema
        # exactly, for BOTH modes: NULL-filled columns the file predates
        # (schema evolution inside the range — previously a permanent
        # stream failure on the plain path), native upcasts for columns
        # a later commit widened, and in CDF mode the synthesized
        # _change_type ('I' for append deltas, from the file for change
        # logs) and constant _commit_version
        import json as _json

        import pyarrow as pa
        import pyarrow.compute as pc

        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        target = to_arrow_schema(
            StructType.fromJson(_json.loads(partition.schema_json)))
        pf = pq.ParquetFile(partition.abs_path)
        have = set(pf.schema_arrow.names)
        want = [n for n in target.names
                if n in have]  # _change_type present only in log files
        for batch in pf.iter_batches(columns=want):
            n = batch.num_rows
            arrays = []
            for field in target:
                if field.name in have:
                    arr = batch.column(field.name)
                    if arr.type != field.type:
                        arr = pc.cast(arr, field.type)
                elif field.name == "_change_type":
                    arr = pa.array(["I"] * n, type=field.type)
                elif field.name == "_commit_version":
                    arr = pa.array([partition.version] * n,
                                   type=field.type)
                else:
                    arr = pa.nulls(n, type=field.type)
                arrays.append(arr)
            yield pa.RecordBatch.from_arrays(arrays, schema=target)

    def commit(self, end: dict) -> None:
        pass


class SnapshotTableDataSource(DataSource):
    """``spark.readStream.format("snapshot_table").load(<table_dir>)``.
    The schema is the CURRENT manifest's committed schema, resolved once
    at stream start. Files from earlier schema generations read ALIGNED
    to it (missing columns NULL-filled, narrower-written columns upcast
    in the Arrow batch), so a stream survives additive evolution in its
    range; columns ADDED after the stream started only appear after a
    restart re-resolves the schema (Delta's rule too)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self):
        import json

        from pyspark.sql.types import (LongType, StringType, StructField,
                                       StructType)

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
        fields = [StructField(f.name, f.dataType, True)
                  for f in committed.fields]
        if str(self.options.get("cdf", "false")).lower() == "true":
            reserved = {"_change_type", "_commit_version"}
            taken = {f.name.casefold() for f in committed.fields}
            if taken & reserved:
                # same rule as snapshot_read_cdf: a real column under a
                # reserved name would be served AS the change labels —
                # silent replica corruption, so refuse up front
                raise ValueError(
                    "snapshot CDF source: the table schema uses a "
                    f"reserved CDF column name ({sorted(reserved)}) — "
                    "rename it to stream the feed")
            fields += [StructField("_change_type", StringType(), True),
                       StructField("_commit_version", LongType(), True)]
        return StructType(fields)

    def streamReader(self, schema) -> SnapshotTableStreamReader:
        return SnapshotTableStreamReader(self.options, schema)


def register_snapshot_source(spark) -> None:
    """Registration (sessions are reused across queries).
    ``spark.dataSource.register`` is replace-on-reregister (verified),
    so no exception guard — a guard here would swallow REAL failures
    (e.g. a build without the Python DataSource API) and defer them to
    a confusing DATA_SOURCE_NOT_FOUND at stream start."""
    spark.dataSource.register(SnapshotTableDataSource)
