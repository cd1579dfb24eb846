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


def snapshot_versions(table_dir: str) -> list[int]:
    """All retained (time-travelable) versions, ascending."""
    snapdir = os.path.join(table_dir, _SNAPDIR)
    if not os.path.isdir(snapdir):
        return []
    return sorted(
        int(e.name[1:-5])
        for e in os.scandir(snapdir)
        if e.name.startswith("v") and e.name.endswith(".json")
    )


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
    appId/version pattern): each version's manifest carries the set of
    epoch keys already folded into the table, and a commit whose key is
    already present is a NO-OP returning the current version. A crash
    AFTER the pointer swap but before the engine records the epoch (the
    dangerous replay window) therefore cannot double-apply the batch;
    a crash BEFORE the swap leaves only an orphaned data dir that
    ``snapshot_expire`` collects."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"snapshot_commit: unknown mode {mode!r}")
    snapdir = os.path.join(table_dir, _SNAPDIR)
    os.makedirs(snapdir, exist_ok=True)

    prev0 = snapshot_current_version(table_dir)
    if epoch_key is not None and prev0 is not None:
        if epoch_key in _read_manifest(table_dir, prev0).get("epochs", []):
            return prev0  # replayed epoch: already committed, skip

    commit_id = uuid.uuid4().hex[:12]
    data_dir = os.path.join(table_dir, "data", commit_id)
    df.write.mode("error").parquet(data_dir)
    new_files = sorted(
        os.path.join("data", commit_id, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )

    prev = snapshot_current_version(table_dir)
    prev_manifest = _read_manifest(table_dir, prev) if prev is not None else {}
    if mode == "append" and prev is not None:
        files = prev_manifest["files"] + new_files
    else:
        files = new_files
    version = 0 if prev is None else prev + 1

    epochs = list(prev_manifest.get("epochs", []))
    if epoch_key is not None:
        epochs.append(epoch_key)
    manifest = {
        "version": version,
        "parent": prev,
        "mode": mode,
        "committed_at": time.time(),
        "files": files,
        "epochs": epochs,
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
        return spark.createDataFrame([], "id long").limit(0)
    return spark.read.parquet(
        *[os.path.join(table_dir, f) for f in m["files"]])


def snapshot_expire(table_dir: str, keep_last: int = 2) -> dict:
    """Retention: drop all but the newest ``keep_last`` manifests, then
    delete every data commit-directory no SURVIVING manifest references
    (which also collects orphans from crashed commits). O(deleted) —
    surviving data is never touched. Returns
    {"expired_versions": [...], "deleted_dirs": [...]}."""
    import shutil

    if keep_last < 1:
        raise ValueError("snapshot_expire: keep_last must be >= 1 — "
                         "expiring every version leaves an unreadable "
                         "table")
    versions = snapshot_versions(table_dir)
    doomed = versions[:-keep_last] if len(versions) > keep_last else []
    survivors = [v for v in versions if v not in doomed]
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
