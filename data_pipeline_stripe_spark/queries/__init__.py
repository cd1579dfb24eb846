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
    # round 11 pins: all 21 r10 pins pruned as pins (every one green in
    # the r10 driver window) — but most re-enter below because r11
    # refactored the code they gate. Pinned here = code changed THIS
    # round (rule 1).
    #
    # r11 NEW verbs/surfaces (VERDICT r10's ranked agenda):
    # 1. admission control on the snapshot streaming source
    "stream_snapshot_source_ratelimited_parity",
    # 2. OVERWRITE WHERE (replaceWhere) with CDF riding through
    "snapshot_replace_where_parity",
    # 3. clustering-preserving OPTIMIZE (lineage recorded in manifest)
    "snapshot_clustered_compact_parity",
    # 4. composite merge keys (band-box dirty split, composite CDF log)
    "snapshot_merge_composite_key_parity",
    # 5. IS NULL / IN / OR pruning over the harvested footer stats
    "snapshot_null_in_pruned_read",
    # 6. the batch Python DataSource + CREATE VIEW ... USING SQL surface
    "snapshot_sql_surface_parity",
    # 8 (beyond the agenda): skipChangeCommits on the plain stream —
    # the restarted drain skips a CDC rewrite and consumes exactly the
    # next append (the refusal without the option is pinned in-gate)
    "stream_snapshot_source_skip_changes_parity",
    # 8 (beyond the agenda): retention finally driver-gated — expire
    # sweeps exactly the unreferenced pre-compact dirs, survivors stay
    "snapshot_expire_retention_parity",
    # 7. ntile re-routed through the two-phase global rank
    # (operators/packing.py:global_ntile) — no more single-partition
    # window exchange
    "ntile_customer_quartiles",
    #
    # r11 REFACTORED code paths re-gating (rule 1): operators/merge.py
    # went composite-key (every verb's join/window/diff rebuilt on key
    # lists), operators/snapshots.py's split/band/stats/pruning core
    # changed (_split_dirty signature, _update_bands, null-count
    # completeness in _collect_file_stats, _entry_may_match, cluster
    # lineage in every manifest), and sources/snapshot_source.py was
    # restructured (shared _read_slice, CDF-gated synthesis, cursor
    # admission control)
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
    "merge_upsert_customers",
    "cdc_apply_order_status",
    "cdc_snapshot_diff_orders",
    "merge_upsert_write_roundtrip",
    # oracle-construction path changed (assert -> raise, ADVICE r10):
    "embedding_semantic_dedup_sampled",
    "embedding_rp_lsh_recall_audit_sampled",
]

COVERAGE_DEBT_THIS_ROUND: list[str] = [
    # r11 (VERDICT r10 item 8): these three rows' only driver record
    # was CORRECTNESS_r06.json, which is gone from disk — they are
    # judge-verified green but the ON-DISK window union no longer
    # covers them; re-window them so it is self-contained again.
    "approx_percentiles_price",
    "events_json_blob_agg",
    "winsorized_value_stats",
]
# Rotation note: with the r11 head (34 pins + 3 debt), 13 rotating
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
