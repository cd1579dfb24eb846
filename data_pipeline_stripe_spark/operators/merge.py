"""MERGE INTO (upsert) semantics as a pure DataFrame transform.

The reference stack (and any lakehouse user) expresses incremental
corrections as ``MERGE INTO base USING updates ON key WHEN MATCHED THEN
UPDATE WHEN NOT MATCHED THEN INSERT``. Without table-format jars the
TRANSFORM half of merge is still fully expressible: one full-outer join
on the key plus per-column conditional selection. The write half is the
caller's partition-overwrite (write the merged frame back with dynamic
partition overwrite); this module produces the exact merged rows.

Every verb takes ``key`` as a single column name OR a list of names —
real MERGE conditions are composite (``ON t.date = s.date AND
t.resource = s.resource``, exactly the reference's (date, resourceId)
J3 key); the join is the conjunction of per-column equalities and "NULL
key" means NULL in ANY key column (SQL equality semantics: such a row
can never match).

Scale shape: ONE keyed join — sort-merge on the merge key, or broadcast
when the update batch is small (the common daily-corrections case; AQE
decides from runtime stats). No window, no second pass; row count =
|base ∪ updates by key|, computed without a distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _key_cols(key) -> list[str]:
    """Normalize the ``key`` argument: a column name or a non-empty
    list/tuple of names (composite key). Duplicates rejected — a
    repeated column would silently weaken the join condition."""
    keys = [key] if isinstance(key, str) else list(key)
    if not keys or not all(isinstance(k, str) and k for k in keys):
        raise ValueError(f"merge key must be a column name or a "
                         f"non-empty list of names, got {key!r}")
    if len(set(keys)) != len(keys):
        raise ValueError(f"duplicate column in merge key {keys}")
    return keys


def _eq_on(left_alias: str, right_alias: str, keys: list[str]):
    """Conjunctive equality join condition over the key columns."""
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"{left_alias}.{k}") == F.col(f"{right_alias}.{k}"))
    return cond


def _any_null(alias: str, keys: list[str]):
    """NULL in ANY key column — such a row can never equality-match."""
    cond = F.lit(False)
    for k in keys:
        cond = cond | F.col(f"{alias}.{k}").isNull()
    return cond


def merge_upsert(base: DataFrame, updates: DataFrame,
                 key) -> DataFrame:
    """Upsert ``updates`` into ``base`` on ``key`` (a column name or a
    list of names; both sides must share the same schema; one row per
    key on each side — enforce upstream, like MERGE itself, which
    raises on duplicate matches).

    WHEN MATCHED → the update row wins (full-row update);
    WHEN NOT MATCHED → the update row inserts;
    base rows without an update pass through unchanged. Also emits a
    ``merge_action`` column ('updated' | 'inserted' | 'kept') so callers
    can audit the batch — drop it before writing if unwanted."""
    keys = _key_cols(key)
    cols = base.columns
    if updates.columns != cols:
        raise ValueError(
            f"merge_upsert needs identical schemas, got {cols} vs "
            f"{updates.columns}"
        )
    # Side presence is tracked with literal flags, not key nullness: a
    # NULL merge key never matches the equality join, so keying presence
    # off u.<key>.isNotNull() would let a NULL-key update row collapse
    # into an all-NULL "kept" row. With the flag it is detected as an
    # update row whose key is NULL, and — like MERGE itself — rejected,
    # lazily via raise_error so no extra validation job runs.
    b = base.withColumn("_b_present", F.lit(True)).alias("b")
    u = updates.withColumn("_u_present", F.lit(True)).alias("u")
    joined = b.join(u, _eq_on("b", "u", keys), "full_outer")
    has_update = F.coalesce(F.col("u._u_present"), F.lit(False))
    has_base = F.coalesce(F.col("b._b_present"), F.lit(False))
    picked = [
        F.when(has_update, F.col(f"u.{c}")).otherwise(F.col(f"b.{c}"))
        .alias(c)
        for c in cols
    ]
    action = (
        F.when(
            has_update & _any_null("u", keys),
            F.raise_error(F.lit(
                "merge_upsert: NULL merge key in updates — MERGE requires "
                "non-NULL keys"
            )),
        )
        .when(has_update & has_base, F.lit("updated"))
        .when(has_update, F.lit("inserted"))
        .otherwise(F.lit("kept"))
        .alias("merge_action")
    )
    return joined.select(*picked, action)


def apply_cdc(base: DataFrame, changes: DataFrame, key,
              seq: str = "seq", op: str = "op") -> DataFrame:
    """Apply a CDC change stream (upserts AND deletes) to a base table —
    the APPLY CHANGES half of a lakehouse ingest that merge_upsert's
    update-only contract can't express. ``changes`` carries the base
    schema plus ``op`` ('U' upsert | 'D' delete) and a ``seq`` ordering
    column (unique per key — enforce upstream; ties would make
    latest-wins ambiguous on any engine). ``key`` may be composite.

    Semantics: per key, only the HIGHEST-seq change matters (latest
    wins); a final 'U' upserts the row, a final 'D' removes the key even
    if it was never in base (delete-of-absent is a no-op, as in MERGE
    ... WHEN MATCHED THEN DELETE). Base rows with no change pass
    through. Emits ``cdc_action`` ('upserted' | 'kept') on surviving
    rows; deleted keys simply vanish. NULL change keys raise lazily, as
    in merge_upsert.

    Scale shape: one window over the change BATCH (small side) to take
    latest-per-key, then the same single full-outer keyed join as
    merge_upsert — the base table is never windowed or scanned twice."""
    from pyspark.sql.window import Window as W

    keys = _key_cols(key)
    cols = base.columns
    extra = [c for c in changes.columns if c not in (*cols, seq, op)]
    missing = ({*cols, seq, op}) - set(changes.columns)
    if extra or missing:
        raise ValueError(
            f"apply_cdc: changes must be base columns plus ({seq}, {op}), "
            f"got {changes.columns}"
        )
    w = W.partitionBy(*keys).orderBy(F.col(seq).desc())
    last = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", seq)
    )
    # fail CLOSED on op values outside {'U','D'} (validated on the
    # winning change per key — the one that gets applied): a NULL op
    # would otherwise null out the delete filter and silently DELETE the
    # key; any other junk would silently upsert. Lazy raise_error, first
    # in the chain so later branches can't shadow it.
    last = last.withColumn(
        op,
        F.when(
            F.col(op).isNull() | ~F.col(op).isin("U", "D"),
            F.raise_error(F.concat(
                F.lit("apply_cdc: op must be 'U' or 'D', got "),
                F.coalesce(F.col(op), F.lit("NULL")))),
        ).otherwise(F.col(op)),
    )
    b = base.withColumn("_b_present", F.lit(True)).alias("b")
    c = last.withColumn("_c_present", F.lit(True)).alias("c")
    joined = b.join(c, _eq_on("b", "c", keys), "full_outer")
    has_change = F.coalesce(F.col("c._c_present"), F.lit(False))
    has_base = F.coalesce(F.col("b._b_present"), F.lit(False))
    picked = [
        F.when(has_change, F.col(f"c.{col}")).otherwise(F.col(f"b.{col}"))
        .alias(col)
        for col in cols
    ]
    change_key_null = _any_null("c", keys)
    action = (
        F.when(
            has_change & change_key_null,
            F.raise_error(F.lit(
                "apply_cdc: NULL key in changes — CDC requires non-NULL keys"
            )),
        )
        .when(has_change, F.lit("upserted"))
        .otherwise(F.lit("kept"))
        .alias("cdc_action")
    )
    return (
        joined.filter(
            ~(has_change & (F.col(f"c.{op}") == F.lit("D")))
            | (has_change & change_key_null)
        )
        .select(*picked, action)
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key) -> DataFrame:
    """Derive the CDC change set BETWEEN two table snapshots — the
    inverse of ``apply_cdc``, for sources that can only hand you full
    snapshots (the common SaaS-export shape): one full-outer keyed join
    (``key`` may be composite) classifies every key as inserted
    ('I': in new only), deleted ('D': in old only, row carries the OLD
    values), updated ('U': in both with any column differing,
    NULL-safely), or unchanged (omitted).
    Feeding the result to apply_cdc (I/U as upserts, D as deletes)
    reproduces ``new`` from ``old`` exactly — pinned by
    tests/test_operators.py.

    Scale shape: ONE keyed join and a struct comparison (each side gets
    a per-key window count for the duplicate guard — same key
    partitioning the join shuffles on, no extra pass of either table);
    the output is proportional to the churn, not the table. Fails
    CLOSED on malformed snapshots: NULL keys raise lazily on either
    side (a NULL never matches the join, so it would always
    misclassify as insert+delete), and duplicate keys on either side
    raise too — the full-outer join would fan them out and emit
    conflicting I/U rows for one key, which apply_cdc would then
    replay wrongly with no error."""
    from pyspark.sql.window import Window as W

    keys = _key_cols(key)
    cols = old.columns
    if new.columns != cols:
        raise ValueError(
            f"snapshot_diff needs identical schemas, got {cols} vs "
            f"{new.columns}")
    data_cols = [c for c in cols if c not in keys]
    wk = W.partitionBy(*keys)
    o = (old.withColumn("_o_present", F.lit(True))
         .withColumn("_o_dups", F.count("*").over(wk)).alias("o"))
    n = (new.withColumn("_n_present", F.lit(True))
         .withColumn("_n_dups", F.count("*").over(wk)).alias("n"))
    joined = o.join(n, _eq_on("o", "n", keys), "full_outer")
    has_old = F.coalesce(F.col("o._o_present"), F.lit(False))
    has_new = F.coalesce(F.col("n._n_present"), F.lit(False))
    # a table that is ALL key columns has no data to differ on — every
    # matched key is unchanged (struct() with zero fields would throw)
    same = (F.lit(True) if not data_cols else
            F.struct(*[F.col(f"o.{c}") for c in data_cols]).eqNullSafe(
                F.struct(*[F.col(f"n.{c}") for c in data_cols])))
    null_key = (has_old & _any_null("o", keys)) | (
        has_new & _any_null("n", keys))
    dup_key = (F.coalesce(F.col("o._o_dups"), F.lit(0)) > 1) | (
        F.coalesce(F.col("n._n_dups"), F.lit(0)) > 1)
    op = (
        F.when(null_key, F.raise_error(F.lit(
            "snapshot_diff: NULL key — a NULL never matches the join and "
            "would misreport as insert+delete")))
        .when(dup_key, F.raise_error(F.lit(
            "snapshot_diff: duplicate key within a snapshot — the join "
            "would fan out and emit conflicting change rows; dedupe the "
            "export first")))
        .when(has_new & ~has_old, F.lit("I"))
        .when(has_old & ~has_new, F.lit("D"))
        .when(~same, F.lit("U"))
        .alias("op")
    )
    picked = [
        F.when(has_new, F.col(f"n.{c}")).otherwise(F.col(f"o.{c}")).alias(c)
        for c in cols
    ]
    return (
        joined.select(op, *picked)
        .filter(F.col("op").isNotNull())
    )
