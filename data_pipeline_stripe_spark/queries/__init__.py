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
    # round 9 pins: all 11 r8 pins pruned (every one green in the r8
    # driver window; code untouched since unless re-listed below).
    # Pinned here = code changed THIS round (rule 1).
    #
    # round 9: the snapshot commit protocol was rewritten — manifest
    # publication is now an atomic put-if-absent (os.link CAS), with
    # optimistic-concurrency rebase for appends, per-file column stats
    # in manifests, and incremental reads; every query touching the
    # format re-gates
    "snapshot_time_travel_roundtrip",
    "stream_snapshot_sink_parity",
    # round 9, new: two barrier-started writer threads race 8 appends
    # into one table — no lost update, contiguous versions
    "snapshot_concurrent_commit_parity",
    # round 9, new: manifest min/max stats prune files BEFORE Spark
    # plans the scan; the query raises unless pruning happened
    "snapshot_stats_pruned_read",
    # round 9, new: version-range delta reads (append-only CDF path);
    # full == base + replayed deltas, delta_only vs the day predicate
    "snapshot_incremental_read_parity",
    # round 9, new: additive schema evolution — appends may add
    # columns; old files read them as NULL, history keeps its own
    # narrower schema, type changes are rejected pre-publish
    "snapshot_schema_evolution_parity",
    # round 9, new: transactional MERGE INTO — read-validated overwrite
    # (expected_version), row-level hash with the merge_action audit
    "snapshot_merge_upsert_parity",
    # round 9, new: OPTIMIZE/compaction as a read-validated overwrite —
    # file count shrinks, history stays time-travelable, rows identical
    "snapshot_compact_parity",
    # round 9: the chunked pandas top-k kernel now checkpoints each
    # chunk eagerly and destroys its broadcast (ADVICE r8 low)
    "embedding_topk_cosine_pandas",
    # round 9, new: recall audits for the PQ/ADC compression tier and
    # the RP-LSH blocking tier (VERDICT r8 item 5), composed from the
    # gated components' own fns + oracle texts
    "embedding_pq_recall_audit",
    "embedding_rp_lsh_recall_audit",
    # round 9: oracle rewritten to the pre-bucketed hash-join form so
    # the ×10 campaign can check it (VERDICT r8 item 6); spec predicate
    # unchanged, now the WHERE clause
    "range_join_cooccurring_events",
    # round 9, new: the ×10-checkable sampled twin of semantic dedup
    # (VERDICT r8 item 6) — same operator, vec_id % 10 = 0 corpus
    "embedding_semantic_dedup_sampled",
    # round 9: write_bucketed_table's cache skip path now validates the
    # warehouse files (ADVICE r8 low) — both bucketed-layout consumers
    # re-gate
    "royalties_monthly_usd_bucketed",
    "bucketed_join_roundtrip",
]

COVERAGE_DEBT_THIS_ROUND = [
    # The 29 unchanged queries that VERDICT r8 found in NO driver window
    # across r1-r8 (the 30th, bucketed_join_roundtrip, is a pin above).
    # All have green builder differentials; this tier gives each its
    # first external driver check.
    "mad_outlier_value_stats",
    "ema_daily_value_halflife",
    "pareto_front_orders_price_recency",
    "allocate_budget_by_nation_revenue",
    "value_drift_psi_by_type",
    "peak_concurrent_sessions_daily",
    "trend_slope_daily_revenue_by_type",
    "gini_revenue_concentration_by_region",
    "value_ks_distance_by_type",
    "benford_first_digit_order_prices",
    "session_duration_percentiles_daily",
    "conversion_latency_percentiles_by_cohort",
    "corrupt_json_quarantine",
    "schema_evolution_union_read",
    "variant_nested_extract",
    "try_cast_dirty_values",
    "stream_dedup_parity",
    "stateful_totals_stream_parity",
    "quality_gate_orders_report",
    "zorder_clustered_roundtrip",
    "maintenance_compact_vacuum_roundtrip",
    "gapfill_user_daily_lerp",
    "events_weighted_sample_pps",
    "cdc_snapshot_diff_orders",
    "doc_lm_bigram_score",
    "doc_source_token_entropy",
    "embedding_ivf_topk_pruned",
    "approx_user_overlap_event_types",
    "events_heavy_hitter_value_buckets",
]
# Rotation note: with the final r9 head (15 pins + 29 debt = 44), 6
# rotating slots continue the tile over the remainder; after this round
# the union of driver windows covers the ENTIRE registry, the debt list
# empties, and the tile cadence resumes with ~35 rotating slots.


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
