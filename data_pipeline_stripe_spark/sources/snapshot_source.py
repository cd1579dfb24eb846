"""The snapshot table as a Spark STREAMING SOURCE and BATCH SOURCE
(Python DataSource).

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
end)`` recomputes the identical file set from the immutable manifests
(``partitions`` is a pure function of the offset pair — the law that
makes every admission-control decision below replay-safe).

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
version N's changes (default 0 = the initial commit's rows as 'I');
``option("startingTimestamp", epochSec)`` resolves the smallest
retained version committed at or after the timestamp (Delta's
``startingTimestamp``) — mutually exclusive with startingVersion.
Retention note (ADVICE r10): startingVersion=N anchors the chain walk
at manifest N-1 (the parent file set is what defines version N's
append delta), so N-1 must still be RETAINED — starting at the oldest
un-expired version requires ``snapshot_expire(keep_last=...)`` to have
kept one version of slack; otherwise start the stream from a full
re-read (startingVersion=0 on a compacted/restored lineage, or the
batch read).

ADMISSION CONTROL (r11, VERDICT r10 item 1):
``option("maxFilesPerTrigger", N)`` bounds each micro-batch to at most
N new file entries (data files for the plain source, change-log files
for the CDF source) and ``option("maxRowsPerTrigger", N)`` to at most
N rows and ``option("maxBytesPerTrigger", N)`` to at most N on-disk
bytes (footer row counts and file sizes harvested into every manifest
entry; the tightest configured budget binds), always admitting at
least one full version
— Delta's own contract (version boundaries are never split, so a
single huge commit still arrives whole). Without it, ``latestOffset`` jumps
straight to the table head and a consumer starting on (or catching up
to) a large table gets EVERY pending version as ONE batch — unbounded
work through one trigger, the 100 TB scale-killer. The Python
DataSource API has no ``ReadLimit`` (the Scala
``latestOffset(start, limit)`` form), so the reader tracks its own
high-water cursor: synced from every ``partitions``/``commit`` call
(authoritative — those carry Spark's checkpointed offsets) and from
its own returns. Pair budgets with ``option("cursorLocation", <dir>)``
(one per checkpoint, like the checkpoint itself on shared storage):
every ``commit`` persists the cursor, so the bound is exact for the
initial load AND across restarts. WITHOUT cursorLocation the first
``latestOffset`` of a process cannot tell a fresh start from a
restart (Spark's checkpoint is invisible here, and budget-walking
from the startingVersion default on a restart would return an offset
BELOW the checkpoint — Spark records that as the batch end and
re-serves consumed versions, duplicate rows; ADVICE r11), so it
serves head ONCE — unbounded but correct, offsets never regress —
and the bound resumes from the first partitions/commit sync.
Trigger note:
``availableNow`` snapshots the head offset once up front, so
per-batch admission applies to ``processingTime`` triggers (use the
gated query's drain-until-caught-up loop for bounded full drains).

BATCH + SQL SURFACE (r11, VERDICT r10 item 6): the same format name
serves batch reads — ``spark.read.format("snapshot_table")
.option("version", N | "asOf", epoch).load(path)`` — and therefore
pure SQL via ``CREATE TEMPORARY VIEW t USING snapshot_table OPTIONS
(path '...', version 'N')``; with ``OPTIONS (pushdown 'true')`` the
reader additionally routes WHERE clauses into manifest-stats file
pruning (opt-in; see ``SnapshotTablePushdownReader`` for the
relation-reuse sharp edge that keeps it off the default path).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class SnapshotFileSlice(InputPartition):
    def __init__(self, abs_path: str | None, columns: list[str],
                 kind: str = "data", version: int = -1,
                 schema_json: str | None = None, cdf: bool = False,
                 dv_abs: str | None = None, rel_path: str | None = None,
                 eq_abs: list | None = None,
                 eq_dead_abs: list | None = None):
        self.abs_path = abs_path
        self.columns = columns
        # deletion vector (r12): dv_abs points at the commit's DV
        # parquet dir, rel_path is this file's manifest path — the
        # executor drops the recorded row positions while streaming
        # Arrow batches (merge-on-read; the data file is untouched)
        self.dv_abs = dv_abs
        self.rel_path = rel_path
        # equality deletes (r13): [(abs sidecar path, (key cols,))]
        # applicable to THIS slice (delete seq newer than the file's
        # segment seq) — anti-filtered batch-wise after any DV
        self.eq_abs = eq_abs
        # CDF over an equality-delete commit (r13, second half): the
        # NEW descriptors of the commit — kind 'eqdead' slices KEEP the
        # matching rows (they are the commit's D rows, computed
        # executor-side with pyarrow instead of refusing the range)
        self.eq_dead_abs = eq_dead_abs
        # CDF fields: kind 'data' (append delta — synthesize 'I') or
        # 'log' (recorded change-log file — _change_type comes from the
        # file); version stamps _commit_version; schema_json carries the
        # declared output schema so executors build exact Arrow batches.
        # cdf gates the synthesis: a PLAIN stream over a table that
        # evolved a REAL column named _change_type/_commit_version must
        # serve NULLs for pre-evolution files, not fabricated labels
        # (ADVICE r10) — the reserved-name refusal only applies to the
        # CDF source.
        self.kind = kind
        self.version = version
        self.schema_json = schema_json
        self.cdf = cdf


def _delta_entries(table_dir: str, start_v: int, end_v: int,
                   skip_change_commits: bool = False) -> list[dict]:
    """File entries ADDED in (start_v, end_v] — ``start_v == -1`` means
    the full file set of ``end_v`` (initial load, no history walk).
    Append-only classification over the SHARED chain walk
    (``_manifest_chain`` — one place owns the expired/ancestor
    contract); raises ValueError on an overwrite/rewrite in range (the
    caller must restart from a full re-read) UNLESS
    ``skip_change_commits`` (Delta's ``skipChangeCommits``): then
    rewrite commits contribute NOTHING — only appends' deltas are
    served, so the stream survives merges/compactions/backfills at the
    documented cost that updated/deleted rows are never re-served
    (the CDF source is the exact form)."""
    from ..operators.snapshots import (_manifest_chain, _manifest_files,
                                       _read_manifest_meta,
                                       _segment_entries)

    if start_v < 0:
        try:
            m = _read_manifest_meta(table_dir, end_v)
            entries = _manifest_files(table_dir, m)
        except FileNotFoundError as exc:
            raise ValueError(
                f"snapshot stream source: version {end_v} of {table_dir} "
                "is expired — widen snapshot_expire retention past the "
                "consumer's checkpoint lag") from exc
        # the initial load serves the LIVE state: active equality
        # deletes apply (seq- and key-band-scoped per entry, exactly
        # _read_entries' rule) — without this the first batch served
        # rows the table had already deleted. In-range append deltas
        # below never need this: an eq-delete in range is a rewrite
        # (the plain source raises or, under skipChangeCommits,
        # documents that already-served rows are not retracted), and
        # files appended after it are newer than its seq.
        from ..operators.snapshots import _eq_desc_may_touch

        for e in entries:
            eq = [(d["path"], list(d["cols"]))
                  for d in (m.get("eq_deletes") or [])
                  if e.get("_seq", 0) < d["seq"]
                  and _eq_desc_may_touch(e, d)]
            if eq:
                e["_eq"] = eq
        return entries
    chain = _manifest_chain(table_dir, start_v, end_v,
                            "snapshot stream source")
    entries: list[dict] = []
    for parent_m, m in zip(chain, chain[1:]):
        if m["mode"] != "append":
            if skip_change_commits:
                continue
            raise ValueError(
                f"snapshot stream source: version {m['version']} of "
                f"{table_dir} is a {m['mode']} — the offset range has "
                "no append-only delta; restart the stream from a fresh "
                "checkpoint (full re-read), or pass "
                "option('skipChangeCommits', 'true') to serve appends "
                "only")
        # appends reuse parent segments by reference: the delta is the
        # NEW segments' entries — O(delta) metadata per step (r12)
        base = {s["path"] for s in parent_m["segments"]}
        for seg in m["segments"]:
            if seg["path"] not in base:
                entries.extend(_segment_entries(table_dir, seg))
    return entries


def _cdf_slices(table_dir: str, start_v: int, end_v: int) -> list[tuple]:
    """(rel_path, kind, version, dv_rel, prior_eq, dead_eq) change
    slices for the feed over ``(start_v, end_v]`` — ``start_v == -1``
    includes version 0's initial commit as 'I' rows. Appends
    contribute their delta data files (kind 'data'); rewrites
    contribute their recorded change-log files (kind 'log' — empty log
    = compaction = nothing); an EQUALITY-DELETE commit
    (``snapshot_delete_keys`` — O(keys) metadata, NO recorded log by
    design) contributes its parent's live data files as kind 'eqdead'
    slices whose executors compute the D rows lazily (read the file,
    drop rows a DV or an older descriptor already deleted, KEEP the
    rows the commit's new key sidecars match) — the same lazy
    semantics as the batch CDF (``snapshot_read_cdf``), distributed
    per-file instead of refusing the range (r13); a MERGE-ON-READ
    UPSERT (``snapshot_upsert_keys`` — descriptor + new files in one
    commit) contributes its delta files as kind 'upsert' ('U' rows,
    no band scan). Only a rewrite with NO recorded log and no new
    descriptors (plain overwrite) still raises, Delta's own CDF
    rule."""
    from ..operators.snapshots import _manifest_chain, _segment_entries

    chain = _manifest_chain(table_dir, start_v, end_v,
                            "snapshot CDF source")
    # pair each in-range manifest with its parent (the range anchor /
    # root has none): appends need the parent segment set for their
    # delta
    nodes = (list(zip([None] + chain[:-1], chain)) if start_v < 0
             else list(zip(chain, chain[1:])))
    slices: list[tuple] = []
    for parent_m, m in nodes:
        v = m["version"]
        if m["mode"] == "append":
            base = ({s["path"] for s in parent_m["segments"]}
                    if parent_m is not None else set())
            slices.extend(
                (e["path"], "data", v, None, None, None)
                for seg in m["segments"] if seg["path"] not in base
                for e in _segment_entries(table_dir, seg))
        else:
            entries = m.get("changes")
            if entries is None:
                new_eq = [d for d in (m.get("eq_deletes") or [])
                          if d not in ((parent_m or {})
                                       .get("eq_deletes") or [])]
                if new_eq and parent_m is not None:
                    # MERGE-ON-READ commit family (snapshot_upsert_keys
                    # / snapshot_apply_cdc_mor / snapshot_delete_keys):
                    # the delta files serve as 'U' rows — their keys
                    # are COVERED by their descriptor, no band scan
                    parent_segs = {s["path"]
                                   for s in parent_m["segments"]}
                    slices.extend(
                        (e["path"], "upsert", v, None, None, None)
                        for s in m["segments"]
                        if s["path"] not in parent_segs
                        for e in _segment_entries(table_dir, s))
                    # UNCOVERED descriptors (pure deletes): the D rows
                    # are the PARENT's live rows matching their key
                    # sidecars: per parent file, drop what a DV / an
                    # OLDER descriptor (seq-scoped, exactly
                    # _read_entries' rule) already deleted, keep the
                    # uncovered-descriptor matches. Every parent
                    # segment precedes the delete, so those
                    # descriptors' seq scope is vacuous (batch CDF's
                    # own note). Key-band pruning: a file no uncovered
                    # descriptor can touch contributes no D rows and
                    # gets NO slice — the D scan covers the band, not
                    # the table.
                    from ..operators.snapshots import _eq_desc_may_touch

                    uncov = [d for d in new_eq if not d.get("covered")]
                    prior = parent_m.get("eq_deletes") or []
                    for seg in parent_m["segments"] if uncov else ():
                        seq = seg.get("seq", 0)
                        for e in _segment_entries(table_dir, seg):
                            dead_eq = [(d["path"], list(d["cols"]))
                                       for d in uncov
                                       if _eq_desc_may_touch(e, d)]
                            if not dead_eq:
                                continue
                            prior_eq = [(d["path"], list(d["cols"]))
                                        for d in prior
                                        if seq < d["seq"]
                                        and _eq_desc_may_touch(e, d)] \
                                or None
                            slices.append(
                                (e["path"], "eqdead", v,
                                 (e["dv"]["path"] if e.get("dv")
                                  else None),
                                 prior_eq, dead_eq))
                    continue
                raise ValueError(
                    f"snapshot CDF source: version {v} of {table_dir} "
                    f"is a {m['mode']} with no recorded change log — "
                    "its delta is not expressible; restart the "
                    "consumer from a full re-read")
            slices.extend((e["path"], "log", v, None, None, None)
                          for e in entries)
    return slices


def _version_delta_size(table_dir: str, v: int,
                        cdf: bool) -> tuple[int, int, int]:
    """(files, rows, bytes) version ``v`` contributes to its consumer
    — the admission-control units, read STRAIGHT from the manifest's
    per-version ``delta``/``cdf_delta`` summaries (folded in at commit
    time, VERDICT r11 item 7): ONE manifest-list read per probed
    version, no parent read, no file-entry list parsed — a deep
    catch-up's ``latestOffset`` walk is O(backlog) tiny JSON reads
    instead of O(backlog × table files). Appends: their new data-file
    entries. Rewrites: the recorded change log in CDF mode (an
    equality-delete commit records its PARENT band — the lazy D-row
    scan the consumer actually pays; a plain overwrite counts 0 here
    and ``partitions`` raises the real contract error when the range
    is actually served), the new data entries in plain mode (same:
    the error belongs to ``partitions``)."""
    from ..operators.snapshots import _read_manifest_meta

    m = _read_manifest_meta(table_dir, v)
    d = m["cdf_delta"] if cdf and m["mode"] != "append" else m["delta"]
    return (d["files"], d["rows"], d["bytes"])


def _version_delta_count(table_dir: str, v: int, cdf: bool) -> int:
    """File count of ``_version_delta_size`` (kept as the simple unit
    the tests and the default budget use)."""
    return _version_delta_size(table_dir, v, cdf)[0]


def _budget_spent(totals: tuple, budgets: tuple) -> bool:
    """Any configured budget reached? (None = unbounded dimension.)"""
    return any(b is not None and t >= b for t, b in zip(totals, budgets))


def _budget_exceeded(totals: tuple, deltas: tuple, budgets: tuple) -> bool:
    """Would admitting ``deltas`` overflow any configured budget?"""
    return any(b is not None and t + d > b
               for t, d, b in zip(totals, deltas, budgets))


def _dv_positions(partition: SnapshotFileSlice):
    """The deleted row positions recorded for this slice's file, as a
    sorted numpy array (None when the slice carries no vector)."""
    if partition.dv_abs is None:
        return None
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    dv = pq.read_table(partition.dv_abs, columns=["path", "pos"])
    mask = pc.equal(dv.column("path"), partition.rel_path)
    return np.sort(dv.filter(mask).column("pos").to_numpy())


def _apply_dv(batches, positions):
    """Drop the recorded positions while streaming record batches —
    the running offset maps batch rows to file row positions (the same
    physical order ``_metadata.row_index`` exposes JVM-side)."""
    import numpy as np
    import pyarrow as pa

    offset = 0
    for batch in batches:
        n = batch.num_rows
        hits = positions[(positions >= offset) & (positions < offset + n)]
        if len(hits):
            keep = np.ones(n, dtype=bool)
            keep[hits - offset] = False
            batch = batch.filter(pa.array(keep))
        offset += n
        yield batch


def _eq_key_filters(eq_abs):
    """Load each sidecar's key set once per slice (O(keys), the
    sidecars are small by construction). Single-column keys stay an
    Arrow array for vectorized ``pc.is_in``; composite keys fall back
    to a python tuple set — acceptable because eq sidecars are
    CDC-trickle sized."""
    import pyarrow.parquet as pq

    filters = []
    for path, cols in eq_abs:
        tbl = pq.read_table(path, columns=list(cols))
        if len(cols) == 1:
            filters.append((cols, tbl.column(cols[0]).combine_chunks()))
        else:
            filters.append((cols, set(zip(
                *[tbl.column(c).to_pylist() for c in cols]))))
    return filters


def _eq_hit_mask(batch, cols, keys):
    """Boolean mask of rows matching one descriptor's key set (NULL
    key values never match — an equality delete is an anti-join)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(cols) == 1:
        arr = batch.column(batch.schema.get_field_index(cols[0]))
        hit = pc.is_in(arr, value_set=pc.cast(keys, arr.type))
        return pc.fill_null(hit, False)
    vals = zip(*[batch.column(
        batch.schema.get_field_index(c)).to_pylist() for c in cols])
    return pa.array([v in keys for v in vals])


def _apply_eq(batches, eq_abs):
    """Anti-filter equality-delete keys while streaming record
    batches (r13): every batch drops its matching rows."""
    import pyarrow.compute as pc

    filters = _eq_key_filters(eq_abs)
    for batch in batches:
        for cols, keys in filters:
            if batch.num_rows == 0:
                break
            batch = batch.filter(
                pc.invert(_eq_hit_mask(batch, cols, keys)))
        yield batch


def _apply_eq_semi(batches, eq_abs):
    """KEEP the rows matching ANY descriptor (r13, CDF over an
    equality-delete commit): these are the commit's D rows. Masks OR
    across descriptors on the ORIGINAL batch — a row matched by two
    descriptors is one D, the batch CDF's fold semantics."""
    import pyarrow.compute as pc

    filters = _eq_key_filters(eq_abs)
    for batch in batches:
        if batch.num_rows == 0:
            yield batch
            continue
        mask = _eq_hit_mask(batch, *filters[0])
        for cols, keys in filters[1:]:
            mask = pc.or_(mask, _eq_hit_mask(batch, cols, keys))
        yield batch.filter(mask)


def _read_slice(partition: SnapshotFileSlice):
    """Executor-side Arrow read of one file slice — shared by the
    streaming reader and the batch reader (one aligned-read
    implementation, so the two surfaces cannot drift). Slices carrying
    a deletion vector anti-filter their recorded row positions
    in-stream (r12 merge-on-read deletes); equality-delete sidecars
    (r13) anti-filter by key AFTER the vector (both are "live rows
    only" transforms, so the order only matters for position
    accounting, which the DV step owns)."""
    if partition.abs_path is None:
        return
    import pyarrow.parquet as pq

    gen = _read_slice_raw(partition)
    positions = _dv_positions(partition)
    if positions is not None and len(positions):
        gen = _apply_dv(gen, positions)
    if getattr(partition, "eq_abs", None):
        gen = _apply_eq(gen, partition.eq_abs)
    if getattr(partition, "eq_dead_abs", None):
        # kind 'eqdead' (CDF over an equality-delete commit): after
        # dropping everything already dead, what REMAINS AND MATCHES
        # the commit's new key sidecars is exactly its D rows
        gen = _apply_eq_semi(gen, partition.eq_dead_abs)
    yield from gen


def _read_slice_raw(partition: SnapshotFileSlice):
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
    # exactly: NULL-filled columns the file predates (schema evolution
    # inside the range — previously a permanent stream failure on the
    # plain path), native upcasts for columns a later commit widened,
    # and — in CDF mode ONLY — the synthesized _change_type ('I' for
    # append deltas, from the file for change logs) and constant
    # _commit_version. A plain stream never synthesizes: those names
    # are not reserved there, so a real column under them reads as
    # data (NULL where the file predates it) — ADVICE r10.
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    target = to_arrow_schema(
        StructType.fromJson(json.loads(partition.schema_json)))
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
            elif partition.cdf and field.name == "_change_type":
                # append deltas synthesize 'I'; upsert deltas 'U';
                # eq-delete parent files 'D' (the filter downstream
                # keeps only the rows the commit actually deleted);
                # log files carry the column in-file (never reach
                # this branch)
                label = {"eqdead": "D", "upsert": "U"}.get(
                    partition.kind, "I")
                arr = pa.array([label] * n, type=field.type)
            elif partition.cdf and field.name == "_commit_version":
                arr = pa.array([partition.version] * n,
                               type=field.type)
            else:
                arr = pa.nulls(n, type=field.type)
            arrays.append(arr)
        yield pa.RecordBatch.from_arrays(arrays, schema=target)


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
        start_ts = options.get("startingTimestamp")
        if start_ts is not None:
            # Delta's startingTimestamp: serve changes committed AT OR
            # AFTER the timestamp — the smallest retained version whose
            # committed_at >= ts (O(versions) manifest-list reads,
            # driver-side, once at reader construction). A timestamp
            # past the head starts at head+1 (only future commits).
            if options.get("startingVersion") is not None:
                raise ValueError(
                    "snapshot stream source: pass startingVersion OR "
                    "startingTimestamp, not both")
            from ..operators.snapshots import (_read_manifest_meta,
                                               snapshot_versions)

            ts = float(start_ts)
            start = None
            for v in snapshot_versions(self.table_dir):
                if _read_manifest_meta(
                        self.table_dir, v)["committed_at"] >= ts:
                    start = v
                    break
            if start is None:
                versions = snapshot_versions(self.table_dir)
                start = (versions[-1] + 1) if versions else 0
        else:
            start = int(options.get("startingVersion", 0))
        self._initial = start - 1
        self.max_files = self._pos_int(options, "maxFilesPerTrigger")
        self.max_rows = self._pos_int(options, "maxRowsPerTrigger")
        self.max_bytes = self._pos_int(options, "maxBytesPerTrigger")
        self.skip_change_commits = str(
            options.get("skipChangeCommits", "false")).lower() == "true"
        if self.skip_change_commits and self.cdf:
            raise ValueError(
                "snapshot stream source: skipChangeCommits contradicts "
                "cdf=true — the change feed EXISTS to serve rewrite "
                "commits; drop one of the options")
        self.cursor_dir = options.get("cursorLocation")
        # the admission-control high-water mark: the highest version
        # this reader has RETURNED as an offset or SEEN in a
        # partitions/commit call (those carry Spark's checkpointed
        # offsets, so a replayed batch re-syncs it). Never consulted
        # for correctness — partitions() is a pure function of its
        # offset pair — only for how far latestOffset may advance.
        #
        # _cursor_known tracks whether the cursor reflects REAL consumer
        # state. With ``cursorLocation`` configured it always does:
        # every commit() persists the cursor, so a PRESENT file is the
        # exact high-water mark and an ABSENT file proves no batch was
        # ever committed (fresh start — budget-walking from the
        # startingVersion default is correct; a crashed-uncommitted
        # batch replays through partitions(), which syncs first).
        # WITHOUT cursorLocation the first latestOffset of a process
        # cannot distinguish fresh start from restart: on a restart,
        # budget-walking from the startingVersion default returns a
        # version BELOW Spark's checkpointed offset, which Spark
        # records as the batch END, re-serving already-consumed
        # versions (duplicate rows — ADVICE r11). Unknown cursor →
        # serve head once (the documented unbounded-once behavior);
        # initialOffset (fresh query) or the first partitions/commit
        # (Spark's checkpointed offsets) then make it known and the
        # bound resumes. The cost is that the INITIAL load is bounded
        # only when cursorLocation is set — the documented pairing for
        # exact admission control.
        self._cursor = self._initial
        self._cursor_known = self.cursor_dir is not None
        persisted = self._read_cursor()
        if persisted is not None:
            self._cursor = max(self._cursor, persisted)

    @staticmethod
    def _pos_int(options, name: str) -> int | None:
        raw = options.get(name)
        if raw is None:
            return None
        val = int(raw)
        if val < 1:
            raise ValueError(
                f"snapshot stream source: {name} must be >= 1, "
                f"got {val}")
        return val

    # -- cursor persistence (exact admission control across restarts) --
    def _cursor_path(self) -> str:
        return os.path.join(self.cursor_dir, "cursor.json")

    def _read_cursor(self) -> int | None:
        if not self.cursor_dir:
            return None
        try:
            with open(self._cursor_path()) as fh:
                return int(json.load(fh)["version"])
        except (FileNotFoundError, ValueError, KeyError):
            return None

    def _persist_cursor(self) -> None:
        if not self.cursor_dir:
            return
        os.makedirs(self.cursor_dir, exist_ok=True)
        tmp = self._cursor_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": self._cursor}, fh)
        os.replace(tmp, self._cursor_path())  # atomic publish

    def _sync(self, *versions: int) -> None:
        self._cursor = max(self._cursor, *versions)
        self._cursor_known = True

    def initialOffset(self) -> dict:
        # only called when no checkpoint exists: "nothing consumed yet"
        # IS the consumer's real state, so the cursor is now known and
        # the very first batch budget-walks from it
        self._cursor_known = True
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        from ..operators.snapshots import snapshot_current_version

        head = snapshot_current_version(self.table_dir)
        if head is None:
            return {"version": -1}
        budgets = (self.max_files, self.max_rows, self.max_bytes)
        if not self._cursor_known:
            # restart with no persisted cursor: Spark's checkpointed
            # offset is invisible here, and budget-walking from the
            # startingVersion default could return a version BELOW it —
            # Spark would log that regressed offset as the batch end and
            # re-serve consumed versions (duplicates, ADVICE r11). Serve
            # head once instead (documented unbounded-once behavior);
            # partitions()/commit() sync the true offsets right after.
            self._sync(head)
            return {"version": head}
        if all(b is None for b in budgets) or head <= self._cursor:
            self._sync(head)
            return {"version": head}
        # bounded catch-up: admit whole versions until any configured
        # budget (files / rows / bytes) is spent — always at least one
        # (a single oversized commit still arrives whole; version
        # boundaries are never split, Delta's own contract)
        v, totals = self._cursor, (0, 0, 0)
        while v < head:
            try:
                deltas = _version_delta_size(self.table_dir, v + 1,
                                             self.cdf)
            except FileNotFoundError:
                # a manifest in the catch-up range (or its parent) was
                # expired: budget accounting is impossible. A FRESH
                # consumer (nothing consumed yet) falls back to the
                # unbounded initial load — the start<0 path reads the
                # head manifest alone and never walks the expired
                # prefix. A resuming consumer advances one version and
                # lets partitions() raise the real retention contract
                # error with its hint (admission is an optimization,
                # never the error surface).
                if self._cursor < 0:
                    v = head
                else:
                    v += 1
                break
            admitted = any(t > 0 for t in totals)
            if admitted and _budget_exceeded(totals, deltas, budgets):
                break
            totals = tuple(t + d for t, d in zip(totals, deltas))
            v += 1
            if _budget_spent(totals, budgets):
                break
        self._sync(v)
        return {"version": v}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["version"]), int(end["version"])
        self._sync(s, e)
        if e < 0 or e <= s:
            return [SnapshotFileSlice(None, self.columns)]
        if self.cdf:
            slices = _cdf_slices(self.table_dir, s, e)
            if not slices:
                return [SnapshotFileSlice(None, self.columns)]
            join = os.path.join
            return [
                SnapshotFileSlice(
                    join(self.table_dir, rel),
                    self.columns, kind=kind, version=v,
                    schema_json=self.schema_json, cdf=True,
                    dv_abs=(join(self.table_dir, dv_rel)
                            if dv_rel else None),
                    rel_path=rel,
                    eq_abs=([(join(self.table_dir, p), tuple(c))
                             for p, c in prior_eq]
                            if prior_eq else None),
                    eq_dead_abs=([(join(self.table_dir, p), tuple(c))
                                  for p, c in dead_eq]
                                 if dead_eq else None))
                for (rel, kind, v, dv_rel, prior_eq, dead_eq) in slices
            ]
        entries = _delta_entries(self.table_dir, s, e,
                                 self.skip_change_commits)
        if not entries:
            return [SnapshotFileSlice(None, self.columns)]
        return [
            SnapshotFileSlice(
                os.path.join(self.table_dir, en["path"]),
                self.columns, schema_json=self.schema_json,
                # only the initial head load can see DV-carrying or
                # eq-delete-scoped entries (append deltas are fresh
                # files); the live state must serve post-delete rows
                dv_abs=(os.path.join(self.table_dir, en["dv"]["path"])
                        if en.get("dv") else None),
                rel_path=en["path"],
                eq_abs=([(os.path.join(self.table_dir, p), tuple(c))
                         for p, c in en["_eq"]]
                        if en.get("_eq") else None))
            for en in entries
        ]

    def read(self, partition: SnapshotFileSlice):
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        self._sync(int(end["version"]))
        self._persist_cursor()


def _filter_to_term(f):
    """Map a Spark DataSource Filter to a ``snapshot_scan`` stats term
    (col, op, value) — or None when the filter shape has no
    manifest-stats form (nested column, unsupported class, NULL inside
    an IN list). Stats pruning stays conservative by construction:
    incomparable literal/stat type pairs never prune
    (``_file_may_match``), and the reader hands EVERY filter back to
    Spark for row-level evaluation, so a term mapped here only ever
    REMOVES provably-unmatchable files."""
    from pyspark.sql.datasource import (EqualNullSafe, EqualTo,
                                        GreaterThan, GreaterThanOrEqual,
                                        In, IsNotNull, IsNull, LessThan,
                                        LessThanOrEqual, Not)

    if isinstance(f, Not):
        # NOT (col = v) is the one negation with a manifest-stats form
        # (a constant column equal to v, null-free, proves no match);
        # every other NOT stays row-level in Spark
        child = f.child
        if isinstance(child, EqualTo):
            cattr = getattr(child, "attribute", None)
            if cattr is not None and len(cattr) == 1:
                return (cattr[0], "!=", child.value)
        return None
    ops = {EqualTo: "=", GreaterThan: ">", GreaterThanOrEqual: ">=",
           LessThan: "<", LessThanOrEqual: "<="}
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        return None  # nested path — not a top-level prunable column
    col = attr[0]
    for cls, op in ops.items():
        if isinstance(f, cls):
            return (col, op, f.value)
    if isinstance(f, EqualNullSafe):
        # col <=> NULL matches exactly the null rows (prune on null
        # counts); col <=> v otherwise prunes like '=' (min/max exclude
        # nulls, and null rows cannot equal a non-null literal)
        return ((col, "is_null", None) if f.value is None
                else (col, "=", f.value))
    if isinstance(f, IsNull):
        return (col, "is_null", None)
    if isinstance(f, IsNotNull):
        # prunes a provably all-NULL file — the r11 scan-side probe the
        # SQL surface could not reach before (VERDICT r11 item 6)
        return (col, "is_not_null", None)
    if isinstance(f, In):
        members = list(f.value)
        if any(v is None for v in members):
            return None  # SQL IN (NULL) never matches; leave to Spark
        return (col, "in", members)
    return None


class SnapshotTableBatchReader(DataSourceReader):
    """Batch read of one committed version — the SQL surface
    (``CREATE TEMPORARY VIEW ... USING snapshot_table``): the manifest
    is resolved ONCE here on the driver; each file entry becomes one
    executor-side Arrow slice read under the manifest's schema (the
    same aligned read as the stream, so evolution/widening behave
    identically). This base reader deliberately does NOT implement
    ``pushFilters`` — see ``SnapshotTablePushdownReader``."""

    def __init__(self, options, schema):
        from ..operators.snapshots import _resolve_version

        self.table_dir = options.get("path")
        version = options.get("version")
        as_of = options.get("asOf")
        # the manifest LIST only — segments open at partitions() time,
        # and only the ones the pushed terms may match (r12: SQL
        # pushdown gets the same two-level pruning as snapshot_scan)
        self.manifest = _resolve_version(
            self.table_dir,
            int(version) if version is not None else None,
            float(as_of) if as_of is not None else None)
        self.columns = [f.name for f in schema.fields]
        self.schema_json = schema.json()
        self.pushed_terms: list[tuple] = []

    def partitions(self):
        from ..operators.snapshots import (_derived_partition_terms,
                                           _entry_may_match,
                                           _segment_entries,
                                           _segment_pseudo_entry)

        # hidden partitioning (r12): SQL predicates on SOURCE columns
        # imply partition-field terms — pure-SQL reads of a
        # bucket/day-partitioned table prune without ever naming the
        # hidden field (every pushed filter still re-evaluates in
        # Spark, so derivation can only remove unmatchable files)
        from ..operators.snapshots import _eq_desc_may_touch

        probes = self.pushed_terms + _derived_partition_terms(
            self.manifest.get("partition_spec"), self.pushed_terms)
        eq = self.manifest.get("eq_deletes") or []
        entries = []
        for seg in self.manifest["segments"]:
            pseudo = _segment_pseudo_entry(seg)
            if not all(_entry_may_match(pseudo, t) for t in probes):
                continue  # whole segment provably unmatchable
            seq = seg.get("seq", 0)
            # equality deletes scoped by data age (r13) AND key band
            # (r13 second half): only deletes NEWER than this
            # segment's data, whose recorded key min/max may intersect
            # the file's stats, anti-filter its rows
            for e in _segment_entries(self.table_dir, seg):
                if not all(_entry_may_match(e, t) for t in probes):
                    continue
                eq_abs = [(os.path.join(self.table_dir, d["path"]),
                           tuple(d["cols"]))
                          for d in eq
                          if seq < d["seq"]
                          and _eq_desc_may_touch(e, d)] or None
                entries.append((e, eq_abs))
        if not entries:
            return [SnapshotFileSlice(None, self.columns)]
        return [
            SnapshotFileSlice(
                os.path.join(self.table_dir, e["path"]),
                self.columns, schema_json=self.schema_json,
                dv_abs=(os.path.join(self.table_dir, e["dv"]["path"])
                        if e.get("dv") else None),
                rel_path=e["path"], eq_abs=eq_abs)
            for e, eq_abs in entries
        ]

    def read(self, partition: SnapshotFileSlice):
        return _read_slice(partition)


class SnapshotTablePushdownReader(SnapshotTableBatchReader):
    """The OPT-IN pushdown form (``option("pushdown", "true")``):
    ``pushFilters`` (Spark 4.1 Python DataSource pushdown) routes
    WHERE clauses into the SAME manifest-stats pruning as
    ``snapshot_scan`` — the query plans only the files its predicate
    may match — while handing every filter back to Spark for exact
    row-level evaluation (pruning is file-granular, so the residual
    row filter keeps semantics exact).

    Why opt-in and not the default: Spark 4.1 caches the planned scan
    (reader + pushed state + partitions) ON THE RELATION instance, so
    reusing one loaded DataFrame / temp view across differently-
    filtered queries re-serves the FIRST query's pruned file set —
    measured: ``v.count()`` after ``v.filter(..).count()`` returned
    the filtered count. A pushdown read must therefore be a FRESH
    ``spark.read.format("snapshot_table").option("pushdown", "true")
    .load(path)`` (or a view used by exactly one query shape); the
    default reader has no ``pushFilters`` at all, so the shared-view
    surface can never over-prune."""

    def pushFilters(self, filters):
        for f in filters:
            term = _filter_to_term(f)
            if term is not None:
                self.pushed_terms.append(term)
        # every filter still evaluates in Spark
        return filters


class SnapshotMetadataReader(DataSourceReader):
    """METADATA TABLES (r13 second half — Iceberg's ``history`` /
    ``files`` / ``refs`` metadata tables, reached through pure SQL):
    ``CREATE TEMPORARY VIEW h USING snapshot_table OPTIONS (path '…',
    metadata 'history')``. ``history`` serves one row per retained
    version (the DESCRIBE HISTORY surface — manifest-list reads only);
    ``files`` one row per live data file of the resolved
    ``version``/``asOf`` target (path, seq, footer counts, delete
    attachments, partition tuple + stats as JSON); ``tags`` and
    ``branches`` the WAP reference surfaces; ``eq_deletes`` the
    active descriptor list (merge-on-read delete debt, with per-
    descriptor applicable-file counts). Metadata-sized by
    construction, served as one Arrow batch from a single partition —
    never a data-file open."""

    def __init__(self, options, kind: str):
        from ..operators.snapshots import _resolve_version

        self.kind = kind
        self.table_dir = options.get("path")
        version = options.get("version")
        as_of = options.get("asOf")
        self.manifest = (
            _resolve_version(
                self.table_dir,
                int(version) if version is not None else None,
                float(as_of) if as_of is not None else None)
            if kind in ("files", "eq_deletes") else None)

    def partitions(self):
        return [InputPartition(0)]

    def read(self, partition):
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        from ..operators import snapshots as S

        if self.kind == "history":
            rows, sj = (S._history_rows(self.table_dir),
                        S._HISTORY_SCHEMA_JSON)
        elif self.kind == "tags":
            rows, sj = S._tags_rows(self.table_dir), S._TAGS_SCHEMA_JSON
        elif self.kind == "branches":
            rows, sj = (S._branches_rows(self.table_dir),
                        S._BRANCHES_SCHEMA_JSON)
        elif self.kind == "eq_deletes":
            rows = S._eq_deletes_rows(self.table_dir, self.manifest)
            sj = S._EQ_DELETES_SCHEMA_JSON
        else:
            rows = S._files_rows(self.table_dir, self.manifest)
            sj = S._FILES_SCHEMA_JSON
        target = to_arrow_schema(StructType.fromJson(json.loads(sj)))
        cols = list(zip(*rows)) if rows else [[] for _ in target]
        yield pa.RecordBatch.from_arrays(
            [pa.array(list(c), type=f.type)
             for c, f in zip(cols, target)], schema=target)


_METADATA_KINDS = ("history", "files", "tags", "branches",
                   "eq_deletes")


class SnapshotTableDataSource(DataSource):
    """``spark.readStream.format("snapshot_table").load(<table_dir>)``
    (streaming) and ``spark.read.format("snapshot_table")
    .option("version", N).load(<table_dir>)`` / ``CREATE TEMPORARY
    VIEW t USING snapshot_table OPTIONS (path '...', version 'N')``
    (batch + SQL). The schema is the resolved manifest's committed
    schema — for a stream, the CURRENT version at stream start; for a
    batch read, the ``version``/``asOf`` target's. Files from earlier
    schema generations read ALIGNED to it (missing columns NULL-filled,
    narrower-written columns upcast in the Arrow batch), so a stream
    survives additive evolution in its range; columns ADDED after the
    stream started only appear after a restart re-resolves the schema
    (Delta's rule too). ``option("metadata", "history"|"files")``
    serves the table's METADATA instead (``SnapshotMetadataReader``)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def _metadata_kind(self) -> str | None:
        kind = self.options.get("metadata")
        if kind is None:
            return None
        if kind not in _METADATA_KINDS:
            raise ValueError(
                f"snapshot source: unknown metadata table {kind!r} — "
                f"one of {list(_METADATA_KINDS)}")
        if str(self.options.get("cdf", "false")).lower() == "true":
            raise ValueError(
                "snapshot source: metadata tables have no change feed "
                "— drop one of the options")
        return kind

    def schema(self):
        from pyspark.sql.types import (LongType, StringType, StructField,
                                       StructType)

        from ..operators.snapshots import _resolve_version

        table_dir = self.options.get("path")
        if not table_dir:
            raise ValueError(
                "snapshot source: pass the table directory as "
                ".load(<path>)")
        kind = self._metadata_kind()
        if kind is not None:
            from ..operators import snapshots as S

            sj = {"history": S._HISTORY_SCHEMA_JSON,
                  "files": S._FILES_SCHEMA_JSON,
                  "tags": S._TAGS_SCHEMA_JSON,
                  "branches": S._BRANCHES_SCHEMA_JSON,
                  "eq_deletes": S._EQ_DELETES_SCHEMA_JSON}[kind]
            return StructType.fromJson(json.loads(sj))
        version = self.options.get("version")
        as_of = self.options.get("asOf")
        try:
            m = _resolve_version(
                table_dir,
                int(version) if version is not None else None,
                float(as_of) if as_of is not None else None)
        except ValueError as exc:
            raise ValueError(f"snapshot source: {exc}") from None
        committed = StructType.fromJson(json.loads(m["schema"]))
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

    def reader(self, schema) -> DataSourceReader:
        kind = self._metadata_kind()
        if kind is not None:
            return SnapshotMetadataReader(self.options, kind)
        if str(self.options.get("cdf", "false")).lower() == "true":
            raise ValueError(
                "snapshot source: the change feed is a STREAMING "
                "surface (readStream) or snapshot_read_cdf — the batch "
                "reader serves table states, not change rows")
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return SnapshotTablePushdownReader(self.options, schema)
        return SnapshotTableBatchReader(self.options, schema)

    def streamReader(self, schema) -> SnapshotTableStreamReader:
        if self._metadata_kind() is not None:
            raise ValueError(
                "snapshot source: metadata tables are a BATCH surface "
                "— drop the metadata option to stream the table")
        return SnapshotTableStreamReader(self.options, schema)


def register_snapshot_source(spark) -> None:
    """Registration (sessions are reused across queries).
    ``spark.dataSource.register`` is replace-on-reregister (verified),
    so no exception guard — a guard here would swallow REAL failures
    (e.g. a build without the Python DataSource API) and defer them to
    a confusing DATA_SOURCE_NOT_FOUND at stream start.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime
    conf, off by default in Spark 4.1): with it OFF, Spark refuses to
    plan ANY batch reader that implements ``pushFilters`` — so the
    registration that introduces the reader is the right place to pin
    the conf it requires (sessions built by ``get_session`` already
    carry it)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotTableDataSource)
