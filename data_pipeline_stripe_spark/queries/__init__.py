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
# entries, and the registry holds more than that. Two rules keep every query
# covered:
#
# 1. `PRIORITY_THIS_ROUND` lists the queries whose implementation changed in
#    the current round — they are pinned to the head of the registry, so a
#    change is always gated the round it lands. Update this list whenever a
#    query's code changes (and prune entries from prior rounds: every pin
#    costs one rotating slot).
# 2. Everything else rotates by exactly the number of visible rotating
#    slots, `_WINDOW - len(pinned)`, per round (round number = latest
#    CORRECTNESS_r{N}.json present + 1), so consecutive rounds tile the
#    unpinned queries contiguously: full re-verification of the rest every
#    ceil(len(rest) / (_WINDOW - len(pinned))) rounds, with no query
#    starved. The invariant that matters is rule 1 — changed code is
#    always gated the same round; unchanged code re-verifies on the tile
#    cadence.
# ---------------------------------------------------------------------------

_WINDOW = 50

PRIORITY_THIS_ROUND = [
    # round 6 pins: all 49 r5 pins pruned (gated green in
    # CORRECTNESS_r05.json or re-verified in the r5 full differentials;
    # code untouched since). Pinned here = code changed THIS round.
    #
    # The 8 driver-reds of r5: oracle SUM(<int>) columns DESCRIBEd to
    # DuckDB HUGEINT, which the driver's fetch path renders differently
    # than Spark's BIGINT ("123.0" vs "123") — every oracle now CASTs
    # the sum to BIGINT, and test_oracle_parity.py pins the whole class
    # (every oracle output column must DESCRIBE to an allowlisted type).
    "events_json_blob_agg",
    "salted_join_user_segments",
    "two_phase_agg_value_by_type",
    "rolling_7day_revenue",
    "abc_parts_by_brand_revenue",
    "scd2_pit_lineitem_priority",
    "ivm_merge_revenue_by_month",
    # (winsorized_value_stats moved to the x10-fixes block below —
    # its HUGEINT cast was superseded by the cent-grid band rewrite)
    # round 6: the two permanent no_oracle rows retired — deterministic
    # cross-engine sketches with full transcription oracles (md5 HLL
    # with fixed-point integer fold; cent-quantized mergeable histogram
    # percentiles). Engine-native sketches stay pytest-pinned.
    "approx_distinct_users_per_type",
    "approx_percentiles_price",
    # round 6: oracle division aligned to trunc-toward-zero (ADVICE r5)
    "timeweighted_avg_value_per_user",
    # round 6: LSH band-explode/pair-scoring DRY'd into shared
    # _band_rows/_score_pairs (llm/dedup.py) — pin the queries riding
    # the shared core the round it changes (NOTES_r5 agenda item 2)
    "doc_minhash_lsh_pairs",
    "doc_incremental_dedup",
    # round 6: §2.11 stateful streaming parity now driver-gated (4
    # micro-batch drain through a foreachBatch sink vs the batch oracle)
    "stateful_totals_stream_parity",
    # round 6 (cont. 3): exactly-once ingest — watermarked streaming
    # dedup of a ~6%-replayed source, drained and hash-matched against
    # the un-duplicated fixture
    "stream_dedup_parity",
    # round 6 (cont. 3): the measured worst scaler (BENCH_DIFF §scaling:
    # royalties' fact-fact shuffle, 10× at 100× data) gets its 100 TB
    # fix gated — the identical report tree over bucket-co-located
    # facts; royalties itself pinned because the shared report tree was
    # factored out of it
    "royalties_monthly_usd",
    "royalties_monthly_usd_bucketed",
    # round 6 (cont. 3): the re-run FULL ×10 differential caught two
    # more tied-scale defects — q7's raw-double revenue sum (→ the q8
    # cent-grid integer pattern) and the session oracle's non-total
    # cumsum order (ties split around the session flag; → ts, event_id)
    "q7_nation_trade_flow",
    "session_window_batch",
    # round 6: IVF coarse pre-quantizer — query routing via keyed
    # RP-band join, no query×centroid cross (plan-pinned)
    "embedding_ivf_topk_pruned",
    # round 6: new maintenance/governance gated queries
    "quality_gate_orders_report",
    "zorder_clustered_roundtrip",
    "maintenance_compact_vacuum_roundtrip",
    "gapfill_user_daily_lerp",
    "events_weighted_sample_pps",
    # round 6: deterministic count-min heavy hitters + snapshot-CDC diff
    "events_heavy_hitter_value_buckets",
    "cdc_snapshot_diff_orders",
    # round 6: bucketed co-located join through the catalog
    "bucketed_join_roundtrip",
    # round 6 (cont.): corpus-bigram LM quality score
    "doc_lm_bigram_score",
    # round 6 (cont.): HLL set algebra — pairwise audience overlap by
    # register-wise union + inclusion-exclusion
    "approx_user_overlap_event_types",
    # round 6 (cont.): scale defects found by the x10 replicated-fixture
    # differential — winsorize band moved to the integer cent-grid
    # percentile (interpolation is not ulp-stable on tied ranks);
    # TF-IDF cosine gains the document-frequency cap it claimed to have
    "winsorized_value_stats",
    "doc_tfidf_cosine_pairs",
    # (doc_tfidf_top_terms was pinned here for an oracle-text-only
    # restore; unpinned at the 50-pin ceiling in favor of q10 below —
    # the restore is sealed by the full sf0.001/0.01/0.1 differentials
    # and the ×10 run, and the Spark side never changed.)
    # round 6 (cont. 2): new robust-stats + temporal operators
    "mad_outlier_value_stats",
    "ema_daily_value_halflife",
    # round 6 (cont. 2): decision-support batch (relational6.py) —
    # skyline, exact-sum allocation, PSI drift, sweep-line concurrency
    "pareto_front_orders_price_recency",
    "allocate_budget_by_nation_revenue",
    "value_drift_psi_by_type",
    "peak_concurrent_sessions_daily",
    # round 6 (cont. 2): exact-rational OLS trend + Gini concentration
    "trend_slope_daily_revenue_by_type",
    "gini_revenue_concentration_by_region",
    # round 6 (cont. 2): exact (integer cross-multiplied) two-sample KS
    "value_ks_distance_by_type",
    # round 6 (cont. 2): float-free Benford first-digit audit
    "benford_first_digit_order_prices",
    # round 6 (cont. 2): composition gates — sessionize → duration
    # percentiles; funnel → conversion-latency percentiles
    "session_duration_percentiles_daily",
    "conversion_latency_percentiles_by_cohort",
    # round 6 (cont. 2): corpus-diversity entropy card
    "doc_source_token_entropy",
    # round 6 (cont. 4): ingestion robustness — PERMISSIVE corrupt-record
    # quarantine and mergeSchema evolution read
    "corrupt_json_quarantine",
    "schema_evolution_union_read",
    # round 6 (cont. 4): Spark-4 VariantType semi-structured extraction
    # (parse once, typed path navigation) beside the string-JSON twin
    "variant_nested_extract",
    # round 6 (cont. 4): ANSI-safe try_cast/try_to_timestamp over dirty
    # strings (ANSI mode is Spark 4's default — plain CAST fails the job)
    "try_cast_dirty_values",
    # round 6 (cont. 4): the sharded full-×10 differential caught q10's
    # raw double revenue sum flipping a rounded cent on 10-fold-tied
    # values (same disease q7 had) — cent-grid BIGINT sum now, both
    # engines
    "q10_returned_item_ranking",
]
# NEXT ROUND: prune ALL 49 pins (every one is round-6-changed code; rule 1).
# At 49 pins the rotation has 1 visible slot — the ceiling. The repo's own
# tri-scale differential (tools/oracle_check.py at sf0.001/0.01/0.1 + the
# ×10 fixture) is the full-registry gate in the meantime.


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
    rest = [n for n in names if n not in pinned]
    step = max(1, _WINDOW - len(pinned))
    offset = (_round_number() * step) % len(rest) if rest else 0
    order = pinned + rest[offset:] + rest[:offset]
    reordered = {n: REGISTRY[n] for n in order}
    REGISTRY.clear()
    REGISTRY.update(reordered)


_apply_rotation()

__all__ = ["REGISTRY", "Query", "query", "PRIORITY_THIS_ROUND"]
