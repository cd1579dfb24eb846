"""A minimal snapshot table format on raw parquet — the Iceberg commit
core, hand-built: immutable data files + immutable per-version manifest
files, where PUBLISHING the manifest IS the atomic commit.

What this gives that a bare parquet directory cannot (the gap
SCALING.md's lakehouse mapping documents):

- **Atomic commit / no torn reads.** A commit writes its data files
  into a fresh directory, writes the version manifest to a temp name,
  then PUBLISHES it with an atomic put-if-absent (``os.link`` into
  ``v{N}.json`` — fails ``EEXIST`` if the version is taken). A manifest
  on disk therefore IS a committed version: there is no window in which
  a complete manifest exists but "the commit never happened", so a
  crash can never leave time-travelable uncommitted state (the r8
  review's orphan-manifest hazard is eliminated structurally, not
  patched around). A reader resolves version → manifest → files; every
  object it touches is immutable, so it sees exactly one complete
  version — never a half-written mix, even while a writer is
  mid-commit. Crash windows that remain: an unreferenced data dir
  (crash before publish) and a stale ``*.tmp.*`` manifest (crash
  between temp write and link) — both pure garbage, both collected by
  ``snapshot_expire``, neither readable.
- **Optimistic concurrency (the Iceberg/Delta commit loop).** Version
  numbers are contiguous; each committer targets ``current + 1``. When
  two writers race, exactly one ``os.link`` wins; the loser REBASES —
  an append re-reads the new current, re-targets its (already written,
  immutable) data files onto it, and retries; an overwrite ABORTS with
  ``SnapshotConflictError`` (its decision was based on a state that no
  longer exists — the Delta/Iceberg rule for non-commutative commits).
  Lost updates are impossible: a commit is visible iff its link won.
- **Time travel.** Every version's manifest is retained until expired;
  ``snapshot_read(..., version=N)`` replans any historical state.
- **O(new-data) appends.** An append's manifest references the prior
  version's file entries — nothing is rewritten or copied.
- **File-level column stats + scan pruning.** Each manifest entry
  carries per-column min/max/null-count harvested from the parquet
  FOOTERS of the files it commits (no extra Spark pass), and
  ``snapshot_scan`` drops files a conjunctive predicate provably
  cannot match BEFORE Spark ever plans the read — manifest-level
  pruning, one level above parquet row-group pruning.
- **Incremental (CDF-style) reads.** ``snapshot_read_incremental``
  returns exactly the rows ADDED in a version range by walking the
  manifest parent chain (append-only fast path: set difference of file
  entries) — the base+delta pattern a 100 TB downstream consumer needs
  to avoid full-table rescans.
- **Additive schema evolution.** Appends may ADD columns: shared
  columns keep their exact types (violations raise before anything is
  published), every read plans under the manifest's all-nullable union
  schema so pre-evolution files serve the added columns as NULL, and
  historical versions keep their own narrower schema.
- **Transactional MERGE with read validation.** ``snapshot_merge``
  upserts a batch and commits the result validated against the version
  it READ (``expected_version``) — a commit landing in between aborts
  the merge instead of being silently overwritten (serializable
  read-modify-write, the Delta/Iceberg MERGE conflict rule).
- **OPTIMIZE / compaction.** ``snapshot_compact`` rewrites the current
  version's small files as a read-validated overwrite — rows identical,
  layout consolidated, every prior version still time-travelable (the
  crash-safe, concurrency-safe form of raw-directory compaction).
- **O(deleted) retention.** ``snapshot_expire`` drops old manifests and
  deletes only data directories no surviving manifest references.

What real Iceberg/Delta still add beyond this and this module does
NOT: multi-process CAS through a metastore/log-store (``os.link`` is
the single-filesystem primitive; S3 needs a conditional PUT), type
WIDENING under evolution (only additive columns here), and format
interop. See SCALING.md "Table-format mapping" for the production
swap-in.

The reference has no table format at all (its top10.py:260-278 rewrites
per-day CSVs in a driver loop); this is beyond-reference surface.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAPDIR = "_snapshots"


class SnapshotConflictError(RuntimeError):
    """A concurrent commit won the version this writer targeted and the
    writer's change cannot be safely rebased (overwrite semantics), or
    the retry budget ran out under sustained contention."""


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _SNAPDIR, f"v{version}.json")


_FORMAT_VERSION = 2  # r9: files are {path, stats} dicts, link-published


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as fh:
        m = json.load(fh)
    if m.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"snapshot manifest v{version} of {table_dir} has format "
            f"{m.get('format_version')!r}, this module reads "
            f"{_FORMAT_VERSION} — the table was written by an "
            "incompatible module version; rewrite it (no in-place "
            "migration)")
    return m


def _all_manifest_versions(table_dir: str) -> list[int]:
    snapdir = os.path.join(table_dir, _SNAPDIR)
    if not os.path.isdir(snapdir):
        return []
    return sorted(
        int(e.name[1:-5])
        for e in os.scandir(snapdir)
        if e.name.startswith("v") and e.name.endswith(".json")
    )


def snapshot_current_version(table_dir: str) -> int | None:
    """The newest committed version, or None for an empty table. Under
    the put-if-absent protocol every manifest on disk IS committed, so
    current = max manifest version — no pointer file to race with."""
    versions = _all_manifest_versions(table_dir)
    return versions[-1] if versions else None


def snapshot_versions(table_dir: str) -> list[int]:
    """All retained (time-travelable) versions, ascending. Publication
    is the commit point, so nothing uncommitted can appear here — a
    crashed commit leaves only an unreadable ``*.tmp.*`` file and/or an
    unreferenced data dir, never a ``v{N}.json``."""
    return _all_manifest_versions(table_dir)


def _epoch_sort_key(key: str):
    """Monotone comparison for epoch keys: numeric when both sides
    parse as integers (the foreachBatch epoch-id case), lexicographic
    otherwise — (is_str, value) tuples keep the comparison total."""
    try:
        return (0, int(key), "")
    except ValueError:
        return (1, 0, key)


def _json_stat(value):
    """Parquet footer stat → JSON-storable scalar, or None when the
    value has no faithful JSON form (then the column is simply not
    prunable for that file — conservative, never wrong)."""
    import datetime

    if isinstance(value, bool) or value is None:
        return None  # bool min/max prunes nothing worth the edge cases
    if isinstance(value, (int, float, str)):
        return value
    if isinstance(value, (datetime.date, datetime.datetime)):
        return value.isoformat()
    return None


def _collect_file_stats(abs_path: str) -> dict:
    """Per-column {"min","max","nulls"} from the parquet FOOTER of one
    file — row-group stats folded to file level; no data pages read.
    Columns whose stats are absent/truncated/non-scalar are omitted
    (readers treat missing stats as "cannot prune")."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(abs_path).metadata
    per_col: dict[str, dict] = {}
    complete: dict[str, bool] = {}
    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if "." in name:
                continue  # nested leaf — not a top-level prunable column
            st = col.statistics
            entry = per_col.setdefault(
                name, {"min": None, "max": None, "nulls": 0})
            if st is None or not st.has_min_max:
                complete[name] = False
                continue
            lo, hi = _json_stat(st.min), _json_stat(st.max)
            if lo is None or hi is None:
                complete[name] = False
                continue
            complete.setdefault(name, True)
            entry["min"] = lo if entry["min"] is None else min(
                entry["min"], lo)
            entry["max"] = hi if entry["max"] is None else max(
                entry["max"], hi)
            if st.null_count is not None:
                entry["nulls"] += st.null_count
    return {name: stats for name, stats in per_col.items()
            if complete.get(name)}


def _evolved_schema_json(prev_schema_json: str, df_schema) -> str:
    """Additive schema evolution for appends (the Iceberg/Delta rule
    subset this format supports): columns may be ADDED — never dropped
    from shared names, never type-changed. Shared columns must match
    types exactly; the committed schema becomes prev columns + new-only
    columns (all nullable: older files read the added columns as NULL,
    newer files read columns they lack as NULL). An incompatible append
    raises instead of publishing a manifest later reads would choke on.
    """
    from pyspark.sql.types import StructField, StructType

    prev = StructType.fromJson(json.loads(prev_schema_json))
    # match case-INsensitively: Spark resolves columns case-insensitively
    # by default, so treating 'Day' as a new column beside 'day' would
    # publish a union schema every subsequent read chokes on (ambiguous
    # resolution) — the same column under a case variant keeps the
    # prior casing; only a type mismatch is an error
    prev_by_fold = {f.name.casefold(): f for f in prev.fields}
    added = []
    for f in df_schema.fields:
        have = prev_by_fold.get(f.name.casefold())
        if have is None:
            added.append(f)
        elif have.dataType != f.dataType:
            raise ValueError(
                f"snapshot_commit: append changes column {have.name!r} "
                f"from {have.dataType.simpleString()} to "
                f"{f.dataType.simpleString()} — type changes are not "
                "evolvable; overwrite the table to re-type")
    union = StructType(
        [StructField(f.name, f.dataType, True) for f in prev.fields]
        + [StructField(f.name, f.dataType, True) for f in added])
    return union.json()


def _new_file_entries(table_dir: str, commit_id: str) -> list[dict]:
    data_dir = os.path.join(table_dir, "data", commit_id)
    entries = []
    for f in sorted(os.listdir(data_dir)):
        if not f.endswith(".parquet"):
            continue
        rel = os.path.join("data", commit_id, f)
        entries.append({
            "path": rel,
            "stats": _collect_file_stats(os.path.join(table_dir, rel)),
        })
    return entries


def snapshot_commit(spark: SparkSession, table_dir: str, df: DataFrame,
                    mode: str = "append",
                    epoch_key: str | None = None,
                    max_retries: int = 20,
                    expected_version: int | None = None) -> int:
    """Commit ``df`` as the next version of ``table_dir``. Returns the
    committed version number.

    ``mode="append"``: the new manifest = prior version's file entries
    + the newly written ones (prior data untouched — O(new data)).
    ``mode="overwrite"``: the new manifest = only the new files; prior
    files stay on disk for time travel until expired.

    Commit order: (1) write data files into a fresh immutable commit
    directory — ONCE, outside the retry loop; (2) write the manifest to
    a temp name; (3) publish it with an atomic put-if-absent
    (``os.link`` → ``v{current+1}.json``). Step 3 is THE commit: a
    crash before it leaves only unreferenced garbage (never a readable
    version), and two racing writers cannot both win one version.
    The loser of the race rebases: an append rebuilds its manifest on
    the new current (its data files are immutable — nothing re-runs)
    and retries; an overwrite raises ``SnapshotConflictError`` because
    replaying "replace the whole table" over a state it never saw would
    silently drop the winner's rows.

    ``expected_version`` adds READ VALIDATION (serializable
    read-modify-write): the commit aborts with ``SnapshotConflictError``
    unless the table is still at exactly that version when the publish
    is attempted. Without it, a commit only guarantees it doesn't
    clobber the version it targets; a transform derived from an earlier
    read (MERGE, compaction) must pass the version it READ, or a commit
    landing between read and publish would be silently overwritten.

    ``epoch_key`` makes the commit IDEMPOTENT — the exactly-once sink
    contract a streaming ``foreachBatch`` needs (the Delta txn
    appId/version pattern): each manifest carries the LAST committed
    epoch key, keys must be MONOTONE increasing (foreachBatch epoch ids
    are), and a commit whose key is <= the last committed one is a
    NO-OP returning the current version — O(1) per commit, no
    ever-growing ledger. The check re-runs on every rebase, so two
    writers racing the SAME epoch resolve to exactly one application."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"snapshot_commit: unknown mode {mode!r}")
    snapdir = os.path.join(table_dir, _SNAPDIR)
    os.makedirs(snapdir, exist_ok=True)

    # EARLY checks BEFORE writing any data files — a doomed commit must
    # not pay a (potentially table-sized) parquet write first. Each is
    # re-checked inside the retry loop because the base can move.
    early_prev = snapshot_current_version(table_dir)
    if expected_version is not None and early_prev != expected_version:
        raise SnapshotConflictError(
            f"snapshot_commit: {table_dir} moved to version {early_prev} "
            f"but this commit was derived from a read of version "
            f"{expected_version} — re-read and re-derive")
    if epoch_key is not None and early_prev is not None:
        last = _read_manifest(table_dir, early_prev).get("last_epoch")
        if last is not None and (
                _epoch_sort_key(epoch_key) <= _epoch_sort_key(last)):
            return early_prev  # replayed / stale epoch: already applied
    if mode == "append" and early_prev is not None:
        # raises on a type-incompatible append before the data write
        _evolved_schema_json(
            _read_manifest(table_dir, early_prev)["schema"], df.schema)

    commit_id = uuid.uuid4().hex[:12]
    data_dir = os.path.join(table_dir, "data", commit_id)
    df.write.mode("error").parquet(data_dir)
    new_entries = _new_file_entries(table_dir, commit_id)

    for attempt in range(max_retries + 1):
        prev = snapshot_current_version(table_dir)
        if expected_version is not None and prev != expected_version:
            raise SnapshotConflictError(
                f"snapshot_commit: {table_dir} moved to version {prev} "
                f"but this commit was derived from a read of version "
                f"{expected_version} — re-read and re-derive")
        prev_manifest = (
            _read_manifest(table_dir, prev) if prev is not None else {})
        if epoch_key is not None:
            last = prev_manifest.get("last_epoch")
            if last is not None and (
                    _epoch_sort_key(epoch_key) <= _epoch_sort_key(last)):
                return prev  # a racing writer applied this epoch first
        if mode == "append" and prev is not None:
            files = prev_manifest["files"] + new_entries
            # additive schema evolution — recomputed per rebase because
            # the base (and so the evolved union) may have moved
            schema_json = _evolved_schema_json(
                prev_manifest["schema"], df.schema)
        else:
            files = list(new_entries)
            schema_json = df.schema.json()
        version = (prev if prev is not None else -1) + 1
        manifest = {
            "format_version": _FORMAT_VERSION,
            "version": version,
            "parent": prev,
            "mode": mode,
            "committed_at": time.time(),
            "files": files,
            "schema": schema_json,
            "last_epoch": (
                epoch_key if epoch_key is not None
                else prev_manifest.get("last_epoch")
            ),
        }
        tmp = _manifest_path(table_dir, version) + f".tmp.{commit_id}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            # durability before visibility: the manifest bytes must be
            # on stable storage BEFORE the link makes the version name
            # resolvable, or a power loss could leave a torn v{N}.json
            # that reads as a committed version — the one thing the
            # protocol promises cannot happen
            fh.flush()
            os.fsync(fh.fileno())
        try:
            # atomic put-if-absent: publishes the COMPLETE temp file
            # under the version name, or fails EEXIST — THE commit
            os.link(tmp, _manifest_path(table_dir, version))
        except FileExistsError:
            os.unlink(tmp)
            if mode == "overwrite":
                raise SnapshotConflictError(
                    f"snapshot_commit: version {version} of {table_dir} "
                    "was committed concurrently; an overwrite based on "
                    f"version {prev} cannot be rebased — re-read and "
                    "re-derive the replacement") from None
            continue  # append: rebase onto the new current and retry
        except FileNotFoundError:
            # a concurrent snapshot_expire swept this tmp between write
            # and link (its grace window was <= our in-flight time):
            # not a version conflict — rewrite the tmp and retry
            continue
        os.unlink(tmp)
        # persist the directory entry for v{N}.json as well — link is
        # atomic in memory but the dirent needs its own writeback
        dir_fd = os.open(snapdir, os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)
        return version
    raise SnapshotConflictError(
        f"snapshot_commit: lost the commit race {max_retries + 1} times "
        f"on {table_dir} — sustained contention; raise max_retries or "
        "serialize the writers")


def _resolve_version(table_dir: str, version: int | None) -> dict:
    v = snapshot_current_version(table_dir) if version is None else version
    if v is None:
        raise ValueError(f"snapshot_read: {table_dir} has no commits")
    return _read_manifest(table_dir, v)


def _read_entries(spark: SparkSession, table_dir: str,
                  entries: list[dict], schema_json: str) -> DataFrame:
    """Plan a read of the given manifest file entries UNDER THE
    MANIFEST'S SCHEMA (all-nullable): files written before a column was
    added read it as NULL — how every table format serves an evolved
    schema without rewriting history. An empty selection still reads
    back with the right columns."""
    from pyspark.sql.types import StructField, StructType

    committed = StructType.fromJson(json.loads(schema_json))
    schema = StructType([StructField(f.name, f.dataType, True)
                         for f in committed.fields])
    if not entries:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[os.path.join(table_dir, e["path"]) for e in entries])


def snapshot_read(spark: SparkSession, table_dir: str,
                  version: int | None = None) -> DataFrame:
    """Read a committed version (default: current). Plans directly from
    the manifest's file list — no directory listing, so unreferenced
    in-flight commit directories are invisible."""
    m = _resolve_version(table_dir, version)
    return _read_entries(spark, table_dir, m["files"], m["schema"])


def _file_may_match(stats: dict, col: str, op: str, value) -> bool:
    """Can any row of a file with these footer stats satisfy
    ``col op value``? Missing stats → True (cannot prune). Parquet
    min/max exclude nulls, and none of the supported operators matches
    NULL, so pruning on min/max alone is safe even for files with
    nulls."""
    cs = stats.get(col)
    if not cs or cs.get("min") is None or cs.get("max") is None:
        return True
    lo, hi = cs["min"], cs["max"]
    if type(lo) is not type(value) and not (
            isinstance(lo, (int, float)) and isinstance(value, (int, float))):
        return True  # incomparable stat/literal types: never prune
    if op == "=":
        return lo <= value <= hi
    if op == ">=":
        return hi >= value
    if op == ">":
        return hi > value
    if op == "<=":
        return lo <= value
    if op == "<":
        return lo < value
    raise ValueError(f"snapshot_scan: unsupported operator {op!r}")


def _pruned_entries(table_dir: str, predicates: list[tuple],
                    version: int | None) -> tuple[list[dict], dict]:
    """(surviving file entries, manifest) for a conjunction of
    ``(column, op, literal)`` predicates — the ONE pruning decision
    both ``snapshot_pruned_files`` (the pinnable view) and
    ``snapshot_scan`` (the read) share, so they cannot diverge."""
    m = _resolve_version(table_dir, version)
    kept = [
        e for e in m["files"]
        if all(_file_may_match(e.get("stats", {}), c, op, v)
               for (c, op, v) in predicates)
    ]
    return kept, m


def snapshot_pruned_files(table_dir: str,
                          predicates: list[tuple],
                          version: int | None = None
                          ) -> tuple[list[str], int]:
    """(kept file paths, total file count) for a conjunction of
    ``(column, op, literal)`` predicates against the manifest's
    per-file column stats — the planning decision ``snapshot_scan``
    makes, exposed so tests can pin that pruning actually happened."""
    kept, m = _pruned_entries(table_dir, predicates, version)
    return [e["path"] for e in kept], len(m["files"])


def snapshot_scan(spark: SparkSession, table_dir: str,
                  predicates: list[tuple],
                  version: int | None = None) -> DataFrame:
    """Stats-pruned read: drop every file whose footer min/max prove
    the conjunctive ``(column, op, literal)`` predicate cannot match,
    BEFORE Spark plans the scan, then apply the same predicate as a
    row filter (pruning is file-granular; the residual filter keeps
    exact semantics). Equivalent to ``snapshot_read().filter(...)`` by
    construction — just with fewer files planned."""
    from pyspark.sql import functions as F

    kept, m = _pruned_entries(table_dir, predicates, version)
    df = _read_entries(spark, table_dir, kept, m["schema"])
    import operator as _op

    py_ops = {"=": _op.eq, ">=": _op.ge, ">": _op.gt,
              "<=": _op.le, "<": _op.lt}
    for col, op, value in predicates:
        if op not in py_ops:
            raise ValueError(f"snapshot_scan: unsupported operator {op!r}")
        df = df.filter(py_ops[op](F.col(col), F.lit(value)))
    return df


def snapshot_read_incremental(spark: SparkSession, table_dir: str,
                              from_version: int,
                              to_version: int | None = None) -> DataFrame:
    """Rows ADDED strictly after ``from_version`` up to ``to_version``
    (default current) — the CDF/incremental-consumer read. Walks the
    manifest parent chain from ``to`` back to ``from`` and requires
    every step to be an APPEND (append-only fast path: each commit's
    delta = its new file entries, so the range delta is just the files
    present at ``to`` and absent at ``from`` — no data diffing).
    Raises on an overwrite in the range: its delta is not expressible
    as added files, so the consumer must fall back to a full re-read
    (exactly Delta CDF's behavior for non-append commits without a
    change log)."""
    to_v = (snapshot_current_version(table_dir)
            if to_version is None else to_version)
    if to_v is None or to_v < from_version:
        raise ValueError(
            f"snapshot_read_incremental: bad range ({from_version}, "
            f"{to_v}] on {table_dir}")
    chain_v = to_v
    try:
        while chain_v is not None and chain_v > from_version:
            m = _read_manifest(table_dir, chain_v)
            if m["mode"] != "append":
                raise ValueError(
                    f"snapshot_read_incremental: version {chain_v} is an "
                    "overwrite — the range has no append-only delta; "
                    "re-read the full table instead")
            chain_v = m["parent"]
        if chain_v != from_version:
            raise ValueError(
                f"snapshot_read_incremental: version {from_version} is "
                f"not an ancestor of {to_v} (expired or never existed)")
        to_m = _read_manifest(table_dir, to_v)
        base_paths = {
            e["path"]
            for e in _read_manifest(table_dir, from_version)["files"]
        }
    except FileNotFoundError as exc:
        # a manifest inside the range was expired by retention — the
        # API's contract error, not a raw OS error
        raise ValueError(
            f"snapshot_read_incremental: the range ({from_version}, "
            f"{to_v}] of {table_dir} touches an expired version — "
            "widen retention or fall back to a full re-read"
        ) from exc
    delta = [e for e in to_m["files"] if e["path"] not in base_paths]
    return _read_entries(spark, table_dir, delta, to_m["schema"])


def snapshot_expire(table_dir: str, keep_last: int = 2,
                    tmp_grace_seconds: float = 3600.0) -> dict:
    """Retention: drop all but the newest ``keep_last`` manifests,
    sweep stale ``*.tmp.*`` manifest files older than
    ``tmp_grace_seconds`` (crash debris from between temp-write and
    publish — the grace window protects a commit in flight RIGHT NOW),
    then delete every data commit-directory no SURVIVING manifest
    references (which also collects orphaned data dirs from crashed or
    conflict-aborted commits). O(deleted) — surviving data is never
    touched. Returns {"expired_versions": [...], "deleted_dirs": [...]}.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("snapshot_expire: keep_last must be >= 1 — "
                         "expiring every version leaves an unreadable "
                         "table")
    committed = snapshot_versions(table_dir)
    doomed = committed[:-keep_last] if len(committed) > keep_last else []
    survivors = [v for v in committed if v not in doomed]
    referenced = set()
    for v in survivors:
        for e in _read_manifest(table_dir, v)["files"]:
            referenced.add(e["path"].split(os.sep)[1])  # data/<id>/file
    for v in doomed:
        os.remove(_manifest_path(table_dir, v))
    snapdir = os.path.join(table_dir, _SNAPDIR)
    now = time.time()
    if os.path.isdir(snapdir):
        for e in sorted(os.scandir(snapdir), key=lambda e: e.name):
            if ".tmp." in e.name and (
                    now - e.stat().st_mtime) >= tmp_grace_seconds:
                os.remove(e.path)
    deleted = []
    data_root = os.path.join(table_dir, "data")
    if os.path.isdir(data_root):
        for e in sorted(os.scandir(data_root), key=lambda e: e.name):
            if e.is_dir() and e.name not in referenced:
                shutil.rmtree(e.path)
                deleted.append(e.name)
    return {"expired_versions": doomed, "deleted_dirs": deleted}


def snapshot_merge(spark: SparkSession, table_dir: str,
                   updates: DataFrame, key: str) -> tuple[int, DataFrame]:
    """Transactional MERGE INTO the snapshot table: read the current
    version, ``merge_upsert`` the update batch on ``key`` (matched →
    full-row update, unmatched → insert), and commit the merged state
    as an OVERWRITE validated against the version that was READ
    (``expected_version``) — if any commit landed in between, the merge
    aborts with ``SnapshotConflictError`` instead of silently dropping
    that commit's rows, and the caller re-reads and re-merges (exactly
    Delta/Iceberg's MERGE conflict behavior). Returns (new version,
    the merged frame INCLUDING its ``merge_action`` audit column).

    At 100 TB the overwrite step becomes the format's copy-on-write of
    the dirty files only (here: the whole small table) — the read-
    validate-publish protocol is the part that carries over unchanged.
    """
    from .merge import merge_upsert

    base_version = snapshot_current_version(table_dir)
    if base_version is None:
        raise ValueError(f"snapshot_merge: {table_dir} has no commits")
    base = snapshot_read(spark, table_dir, version=base_version)
    if "merge_action" in (c.casefold() for c in base.columns):
        # merge_upsert emits a synthetic 'merge_action' audit column;
        # dropping it by name would also drop a REAL column of that
        # name from the committed overwrite — refuse the collision
        raise ValueError(
            "snapshot_merge: the table has a 'merge_action' column, "
            "which collides with the merge audit column — rename it "
            "before merging")
    merged = merge_upsert(base, updates, key)
    version = snapshot_commit(
        spark, table_dir, merged.drop("merge_action"), mode="overwrite",
        expected_version=base_version)
    return version, merged


def snapshot_compact(spark: SparkSession, table_dir: str,
                     target_files: int = 1) -> tuple[int, int, int]:
    """OPTIMIZE / small-file compaction as a snapshot commit: read the
    current version, rewrite it as ``target_files`` files, and commit
    the result as an OVERWRITE validated against the version that was
    read (``expected_version`` — a concurrent commit aborts the
    compaction rather than being silently dropped; compaction is
    always safe to just re-run). Rows are IDENTICAL by construction —
    only the file layout changes — and every pre-compaction version
    stays time-travelable until expired, because the overwrite
    references only its own fresh files and ``snapshot_expire`` is
    what eventually reclaims the small ones. Returns
    (new_version, files_before, files_after).

    At 100 TB this runs per partition/band with a predicate, not
    whole-table; the read-validate-publish protocol and the
    history-preserving overwrite are the parts that carry over."""
    base_version = snapshot_current_version(table_dir)
    if base_version is None:
        raise ValueError(f"snapshot_compact: {table_dir} has no commits")
    manifest = _read_manifest(table_dir, base_version)
    files_before = len(manifest["files"])
    df = snapshot_read(spark, table_dir, version=base_version)
    version = snapshot_commit(
        spark, table_dir, df.repartition(target_files), mode="overwrite",
        expected_version=base_version)
    files_after = len(_read_manifest(table_dir, version)["files"])
    return version, files_before, files_after
