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
    # round 10 pins: all 15 r9 pins pruned (every one green in the r9
    # driver window; code untouched since unless re-listed below).
    # Pinned here = code changed THIS round (rule 1).
    #
    # round 10: the snapshot commit core was refactored into the
    # Spark-free _publish_commit OCC loop (rewrite mode, change-log
    # entries, expire-race guards), schema evolution gained lossless
    # type widening, and expire gained the data-dir grace window —
    # every query touching the format re-gates
    "snapshot_time_travel_roundtrip",
    "stream_snapshot_sink_parity",
    "snapshot_concurrent_commit_parity",
    "snapshot_stats_pruned_read",
    "snapshot_incremental_read_parity",
    "snapshot_schema_evolution_parity",
    "snapshot_merge_upsert_parity",
    "snapshot_compact_parity",
    # round 10, new: predicate-scoped copy-on-write MERGE — untouched
    # band files carried forward byte-identical (the query raises
    # otherwise), hash vs the whole-table merge oracle
    "snapshot_partial_merge_parity",
    # round 10, new: row-level DELETEs (apply_cdc through the table)
    # + the change data feed across appends, a CDC commit and a
    # compaction; replaying the feed over v0 must equal the head
    "snapshot_cdf_read_parity",
    # round 10, new: timestamp time travel — captured wall-clock
    # stamps resolve to exactly the versions committed before them
    "snapshot_as_of_read_parity",
    # round 10, new: z-clustered commits — the 2-D rectangle must
    # stats-prune strictly harder than the naive twin's layout
    "snapshot_clustered_write_parity",
    # round 10, new: the snapshot table as a streaming SOURCE (offsets
    # are versions); restart consumes exactly the delta
    "stream_snapshot_source_parity",
    # round 10, new: MERGE gains WHEN NOT MATCHED BY SOURCE THEN
    # DELETE under an explicit scope band — deletes ride the CDF,
    # out-of-scope files stay carried forward byte-identical
    "snapshot_merge_delete_unmatched_parity",
    # round 10, new: the change data feed as a STREAMING source
    # (option cdf=true) — the stream survives a CDC rewrite commit
    # and the restarted drain replays to the exact head state
    "stream_snapshot_cdf_source_parity",
    # round 10, new: DESCRIBE HISTORY — per-version mode/row-count/
    # change-log report assembled from manifests alone (footer row
    # counts recorded at commit time)
    "snapshot_history_parity",
    # round 10, new: RESTORE TABLE TO VERSION — O(1) file re-reference
    # commit with the restore's exact row-level change log recorded
    "snapshot_restore_parity",
    # round 10, new: CDC replication — the CDF streamed from table A
    # and applied per-micro-batch into replica B (upserts + deletes),
    # exact across a restart
    "stream_snapshot_replication_parity",
    # round 10, new: the UPDATE SET form of the not-matched-by-source
    # clause (soft-delete / staleness marking), same scope rules
    "snapshot_merge_update_unmatched_parity",
    # round 10, new: the ×10-checkable sampled twin of the RP-LSH
    # recall audit — retires VERDICT r9's one not-directly-×10-run row
    "embedding_rp_lsh_recall_audit_sampled",
    # round 10: write_bucketed_table's skip path now requires the full
    # one-file-per-bucket layout (ADVICE r9 low) — both bucketed-layout
    # consumers re-gate
    "royalties_monthly_usd_bucketed",
    "bucketed_join_roundtrip",
]

COVERAGE_DEBT_THIS_ROUND: list[str] = [
    # EMPTY as planned (VERDICT r9 item 8): the union of driver windows
    # r1-r9 covers every query registered before this round (the r9
    # debt tier retired the last 29), and every r10-new query is a pin
    # above — so there is no unchanged, never-driver-checked query
    # left. Recompute from the CORRECTNESS_r*.json union each round.
]
# Rotation note: with the r10 head (15 pins + 0 debt), 35 rotating
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
