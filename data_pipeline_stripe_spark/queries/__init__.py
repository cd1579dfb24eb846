"""Declared query registry: every operator of SURVEY.md §2 as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
ANSI-SQL oracle twin that DuckDB runs over the same parquet tables. The
driver hash-compares both at sf0.01 (row count + schema + order-insensitive
value hash, columns sorted by name) — so every computed column is aliased
identically on both sides, doubles are rounded on both sides, and
timestamps are rendered to strings on both sides.
"""

import os
import re

from .registry import REGISTRY, Query, query  # noqa: F401

# Importing the modules populates REGISTRY via the @query decorator.
from . import llm_text  # noqa: E402,F401
from . import llm_similarity  # noqa: E402,F401
from . import llm_multimodal  # noqa: E402,F401
from . import stripe  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import relational4  # noqa: E402,F401
from . import relational5  # noqa: E402,F401
from . import relational6  # noqa: E402,F401
from . import io_roundtrip  # noqa: E402,F401
from . import ingest_robust  # noqa: E402,F401
from . import streaming_gate  # noqa: E402,F401
from . import maintenance  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Correctness-window rotation policy
#
# The driver's per-round gate hash-checks only the FIRST `_WINDOW` registry
# entries, and the registry holds more than that. Three rules keep every
# query covered:
#
# 1. `PRIORITY_THIS_ROUND` lists the queries whose implementation changed in
#    the current round — they are pinned to the head of the registry, so a
#    change is always gated the round it lands. Update this list whenever a
#    query's code changes (and prune entries from prior rounds: every pin
#    costs one rotating slot).
# 2. `COVERAGE_DEBT_THIS_ROUND` (r9+) lists unchanged queries that have
#    never appeared in ANY driver window — placed right after the pins so
#    the external gate sees them at least once. VERDICT r8 counted 30 such
#    queries after 8 rounds of pure tiling; this tier retires that debt
#    explicitly instead of waiting for the tile to come around. Recompute
#    per round from the CORRECTNESS_r*.json union; empty it once the union
#    covers the registry.
# 3. Everything else rotates by exactly the number of visible rotating
#    slots, `_WINDOW - len(head)`, per round (round number = latest
#    CORRECTNESS_r{N}.json present + 1), so consecutive rounds tile the
#    unpinned queries contiguously, with no query starved. The invariant
#    that matters is rule 1 — changed code is always gated the same round;
#    unchanged code re-verifies on the tile cadence.
# ---------------------------------------------------------------------------

_WINDOW = 50

PRIORITY_THIS_ROUND = [
    # round 12 pins: all 34 r11 pins + 3 debt rows pruned (every one
    # green in the r11 driver window) — most snapshot/stream rows
    # re-enter below because r12 rewrote the format core they gate.
    # Pinned here = code changed THIS round (rule 1).
    #
    # r12 NEW surfaces (VERDICT r11's ranked agenda):
    # 1. hierarchical manifests: segment files + manifest lists,
    #    O(new) commit metadata, segment-rollup scan pruning, O(1)
    #    admission probes (delta summaries in every manifest)
    "snapshot_manifest_scale_parity",
    # 2. deletion vectors: merge-on-read DELETE WHERE, byte-identical
    #    data files, OPTIMIZE materializes, CDF rides through
    "snapshot_deletion_vector_parity",
    # 3. conflict narrowing: rewrites rebase over disjoint interleaved
    #    appends (base_version API), in-band appends still abort
    "snapshot_conflict_rebase_parity",
    # 4. partition-spec transforms: exact partition pruning,
    #    metadata-only partition retirement, file-level expire GC
    "snapshot_partition_spec_parity",
    # 5. streaming LSH index maintenance over the rate-limited source
    #    (epoch-keyed exactly-once probe/append loop)
    "stream_lsh_index_maintenance_parity",
    # 6. pushdown completeness: IsNotNull / Not(EqualTo) /
    #    EqualNullSafe legs on the SQL surface
    "snapshot_sql_surface_parity",
    # beyond the agenda: CHECK constraints as table properties
    # (metadata-only add/drop, enforced fail-closed on every
    # data-adding verb)
    "snapshot_check_constraint_parity",
    # ADVICE r11 (high): cursor-unknown restart serves head once
    # instead of regressing offsets below Spark's checkpoint
    "stream_snapshot_source_ratelimited_parity",
    # ADVICE r11 (low): ntile total now rides the same B-row counts
    # frame as the ranking (one plan, one scan)
    "ntile_customer_quartiles",
    #
    # r12 REFACTORED code paths re-gating (rule 1): the ENTIRE
    # manifest core moved to format v3 (segments, delta summaries,
    # probe-based dirty splits, _read_entries DV anti-join, expire
    # segment/file GC) and sources/snapshot_source.py restructured
    # (segment-based deltas, O(1) admission probes, DV slices,
    # pushdown mapping) — every snapshot/stream gate's substrate
    # changed, so the whole family re-gates this round
    "snapshot_replace_where_parity",
    "snapshot_merge_composite_key_parity",
    "snapshot_clustered_compact_parity",
    "snapshot_null_in_pruned_read",
    "stream_snapshot_source_skip_changes_parity",
    "snapshot_expire_retention_parity",
    "snapshot_time_travel_roundtrip",
    "stream_snapshot_sink_parity",
    "snapshot_concurrent_commit_parity",
    "snapshot_incremental_read_parity",
    "snapshot_schema_evolution_parity",
    "snapshot_as_of_read_parity",
    "snapshot_history_parity",
    "snapshot_merge_upsert_parity",
    "snapshot_partial_merge_parity",
    "snapshot_merge_delete_unmatched_parity",
    "snapshot_merge_update_unmatched_parity",
    "snapshot_cdf_read_parity",
    "snapshot_compact_parity",
    "snapshot_stats_pruned_read",
    "snapshot_clustered_write_parity",
    "stream_snapshot_source_parity",
    "stream_snapshot_cdf_source_parity",
    "stream_snapshot_replication_parity",
    "snapshot_restore_parity",
]

COVERAGE_DEBT_THIS_ROUND: list[str] = [
    # r11's three debt rows landed in the r11 window
    # (CORRECTNESS_r11.json on disk) — the union is self-contained;
    # no new debt this round.
]
# Rotation note: with the r12 head (34 pins + 0 debt), 16 rotating
# slots resume the tile over the remaining queries.


def _round_number() -> int:
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    rounds = [
        int(m.group(1))
        for f in os.listdir(repo_root)
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f))
    ]
    return (max(rounds) + 1) if rounds else 1


def _apply_rotation() -> None:
    names = list(REGISTRY)
    pinned = [n for n in PRIORITY_THIS_ROUND if n in REGISTRY]
    debt = [n for n in COVERAGE_DEBT_THIS_ROUND
            if n in REGISTRY and n not in pinned]
    head = pinned + debt
    rest = [n for n in names if n not in head]
    step = max(1, _WINDOW - len(head))
    offset = (_round_number() * step) % len(rest) if rest else 0
    order = head + rest[offset:] + rest[:offset]
    reordered = {n: REGISTRY[n] for n in order}
    REGISTRY.clear()
    REGISTRY.update(reordered)


_apply_rotation()

__all__ = ["REGISTRY", "Query", "query", "PRIORITY_THIS_ROUND",
           "COVERAGE_DEBT_THIS_ROUND"]
