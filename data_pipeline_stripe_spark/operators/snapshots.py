"""A minimal snapshot table format on raw parquet — the Iceberg commit
core, hand-built: immutable data files + immutable per-version manifest
files + one atomically-swapped current pointer.

What this gives that a bare parquet directory cannot (the gap
SCALING.md's lakehouse mapping documents):

- **Atomic commit / no torn reads.** A commit writes its data files
  into a fresh directory, writes a NEW manifest listing every file of
  the new version, then swaps the ``_current`` pointer with
  ``os.replace`` (atomic on POSIX). A reader resolves pointer →
  manifest → files; every object it touches is immutable, so it sees
  exactly one complete version — never a half-written mix, even while
  a writer is mid-commit.
- **Time travel.** Every version's manifest is retained until expired;
  ``snapshot_read(..., version=N)`` replans any historical state.
- **O(new-data) appends.** An append's manifest references the prior
  version's files — nothing is rewritten or copied.
- **O(deleted) retention.** ``snapshot_expire`` drops old manifests and
  deletes only data directories no surviving manifest references.

What real Iceberg/Delta add beyond this and this module does NOT:
optimistic concurrency for MULTIPLE writers (here, concurrent commits
are last-pointer-swap-wins), column-level stats in manifests, and
format interop. Single-writer/many-reader — the semantics the gated
round-trip proves — is the part the engine needs; see SCALING.md
"Table-format mapping" for the production swap-in.

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
_CURRENT = "_current"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _SNAPDIR, f"v{version}.json")


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)


def snapshot_current_version(table_dir: str) -> int | None:
    """The committed version the pointer names, or None for an empty
    table. Readers resolve this exactly once per plan."""
    ptr = os.path.join(table_dir, _SNAPDIR, _CURRENT)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return int(fh.read().strip())


def _all_manifest_versions(table_dir: str) -> list[int]:
    """Every manifest on disk, COMMITTED OR NOT, ascending — internal:
    version allocation and expiry must see crash-orphaned manifests
    (written but never pointer-swapped) that readers must not."""
    snapdir = os.path.join(table_dir, _SNAPDIR)
    if not os.path.isdir(snapdir):
        return []
    return sorted(
        int(e.name[1:-5])
        for e in os.scandir(snapdir)
        if e.name.startswith("v") and e.name.endswith(".json")
    )


def snapshot_versions(table_dir: str) -> list[int]:
    """All retained COMMITTED (time-travelable) versions, ascending.
    A manifest newer than the current pointer is a crash orphan — its
    commit never happened — and is never reported here: readers must
    not be able to time-travel into uncommitted state."""
    current = snapshot_current_version(table_dir)
    if current is None:
        return []
    return [v for v in _all_manifest_versions(table_dir) if v <= current]


def _epoch_sort_key(key: str):
    """Monotone comparison for epoch keys: numeric when both sides
    parse as integers (the foreachBatch epoch-id case), lexicographic
    otherwise — (is_str, value) tuples keep the comparison total."""
    try:
        return (0, int(key), "")
    except ValueError:
        return (1, 0, key)


def snapshot_commit(spark: SparkSession, table_dir: str, df: DataFrame,
                    mode: str = "append",
                    epoch_key: str | None = None) -> int:
    """Commit ``df`` as the next version of ``table_dir``. Returns the
    new version number.

    ``mode="append"``: the new manifest = prior version's files + the
    newly written files (prior data untouched — O(new data)).
    ``mode="overwrite"``: the new manifest = only the new files; prior
    files stay on disk for time travel until expired.

    Commit order: (1) write data files into a fresh immutable commit
    directory, (2) write the immutable manifest, (3) ``os.replace`` the
    current pointer. A crash between any two steps leaves the table at
    the OLD version with some unreferenced garbage — never a corrupt
    state; ``snapshot_expire`` collects the orphans.

    ``epoch_key`` makes the commit IDEMPOTENT — the exactly-once sink
    contract a streaming ``foreachBatch`` needs (the Delta txn
    appId/version pattern): each manifest carries the LAST committed
    epoch key, keys must be MONOTONE increasing (foreachBatch epoch ids
    are), and a commit whose key is <= the last committed one is a
    NO-OP returning the current version — O(1) per commit, no
    ever-growing ledger. A crash AFTER the pointer swap but before the
    engine records the epoch (the dangerous replay window) therefore
    cannot double-apply the batch; a crash BEFORE the swap leaves only
    orphaned garbage (a data dir, possibly a manifest that was never
    pointer-swapped) that ``snapshot_expire`` collects. Version numbers
    are allocated past every manifest on disk — committed or orphaned —
    so a crash can never cause a later commit to REWRITE an existing
    manifest file (manifests stay immutable once named)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"snapshot_commit: unknown mode {mode!r}")
    snapdir = os.path.join(table_dir, _SNAPDIR)
    os.makedirs(snapdir, exist_ok=True)

    prev = snapshot_current_version(table_dir)
    prev_manifest = _read_manifest(table_dir, prev) if prev is not None else {}
    if epoch_key is not None:
        last = prev_manifest.get("last_epoch")
        if last is not None and (
                _epoch_sort_key(epoch_key) <= _epoch_sort_key(last)):
            return prev  # replayed / stale epoch: already applied, skip

    commit_id = uuid.uuid4().hex[:12]
    data_dir = os.path.join(table_dir, "data", commit_id)
    df.write.mode("error").parquet(data_dir)
    new_files = sorted(
        os.path.join("data", commit_id, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )

    if mode == "append" and prev is not None:
        files = prev_manifest["files"] + new_files
    else:
        files = new_files
    on_disk = _all_manifest_versions(table_dir)
    version = max(on_disk + [prev if prev is not None else -1]) + 1

    manifest = {
        "version": version,
        "parent": prev,
        "mode": mode,
        "committed_at": time.time(),
        "files": files,
        "schema": df.schema.json(),
        "last_epoch": (
            epoch_key if epoch_key is not None
            else prev_manifest.get("last_epoch")
        ),
    }
    # manifest is immutable once named: write-temp + replace so a
    # concurrent reader of v{N} never sees a partial JSON
    tmp = _manifest_path(table_dir, version) + f".tmp.{commit_id}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(table_dir, version))

    ptr_tmp = os.path.join(snapdir, f"{_CURRENT}.tmp.{commit_id}")
    with open(ptr_tmp, "w") as fh:
        fh.write(str(version))
    os.replace(ptr_tmp, os.path.join(snapdir, _CURRENT))  # THE commit
    return version


def snapshot_read(spark: SparkSession, table_dir: str,
                  version: int | None = None) -> DataFrame:
    """Read a committed version (default: current). Plans directly from
    the manifest's file list — no directory listing, so unreferenced
    in-flight commit directories are invisible."""
    v = snapshot_current_version(table_dir) if version is None else version
    if v is None:
        raise ValueError(f"snapshot_read: {table_dir} has no commits")
    m = _read_manifest(table_dir, v)
    if not m["files"]:
        # the manifest carries the committed schema, so an empty
        # version still reads back with the right columns
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(m["schema"])))
    return spark.read.parquet(
        *[os.path.join(table_dir, f) for f in m["files"]])


def snapshot_expire(table_dir: str, keep_last: int = 2) -> dict:
    """Retention: drop all but the newest ``keep_last`` COMMITTED
    manifests, drop every crash-orphaned manifest (version > current
    pointer — written but never committed), then delete every data
    commit-directory no SURVIVING manifest references (which also
    collects orphaned data dirs from crashed commits). Survivors are
    anchored on the CURRENT POINTER, never on raw manifest file names —
    an orphan manifest newer than the pointer can therefore never
    out-rank (and expire) the live version. O(deleted) — surviving data
    is never touched. Returns
    {"expired_versions": [...], "deleted_dirs": [...]}."""
    import shutil

    if keep_last < 1:
        raise ValueError("snapshot_expire: keep_last must be >= 1 — "
                         "expiring every version leaves an unreadable "
                         "table")
    committed = snapshot_versions(table_dir)  # <= current pointer only
    current = snapshot_current_version(table_dir)
    orphans = [v for v in _all_manifest_versions(table_dir)
               if current is None or v > current]
    doomed = (committed[:-keep_last] if len(committed) > keep_last
              else []) + orphans
    survivors = [v for v in committed if v not in doomed]
    referenced = set()
    for v in survivors:
        for f in _read_manifest(table_dir, v)["files"]:
            referenced.add(f.split(os.sep)[1])  # data/<commit_id>/file
    for v in doomed:
        os.remove(_manifest_path(table_dir, v))
    deleted = []
    data_root = os.path.join(table_dir, "data")
    if os.path.isdir(data_root):
        for e in sorted(os.scandir(data_root), key=lambda e: e.name):
            if e.is_dir() and e.name not in referenced:
                shutil.rmtree(e.path)
                deleted.append(e.name)
    return {"expired_versions": doomed, "deleted_dirs": deleted}
