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
    # round 7 pins: all 49 r6 pins pruned (every one sealed green in the
    # r6 tri-scale differentials and the x10 campaign; code untouched
    # since). Pinned here = code changed THIS round (rule 1).
    #
    # round 7: the ROUND(SUM(<double>)) oracle class converted wholesale
    # to the cent-grid BIGINT sum (the q7/q10 tied-scale disease —
    # NOTES_r6 "Open class, r7 agenda"), guarded by
    # test_no_compared_float_sum_in_oracles. Also integer-exact rewrites
    # of the compared float *thresholds* riding the same diff: q17's
    # qty<0.2·AVG cross-multiplied, q15's max-revenue equality on the
    # grid integer, q22's avg-balance threshold from the exact cent sum.
    "q1_pricing_summary",
    "star_join_revenue_by_region",
    "expression_join_nation_region",
    "running_order_total_per_customer",
    "rollup_revenue",
    "cube_orders_status_priority",
    "conditional_order_classes",
    "pivot_quantity_by_status",
    "grouping_sets_revenue",
    "sql_udf_usage_percent",
    "q3_shipping_priority",
    "q5_supplier_customer_by_nation",
    "q17_small_quantity_revenue",
    "q6_forecast_revenue_delta",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q22_dormant_high_balance",
    "royalties_monthly_usd",
    "royalties_monthly_usd_bucketed",
    "royalties_json_roundtrip",
    # round 7: deterministic domain-mixture resampling (Hamilton quotas
    # + md5-systematic selection; llm/sampling.py)
    "doc_mixture_resample",
    # round 7: third §2.11 driver row — watermarked stream-stream
    # attribution join drained across 4 micro-batches, with pairs that
    # genuinely straddle the batch cuts (2-day window)
    "stream_attribution_parity",
    # round 7: idempotent single-partition backfill via dynamic
    # partition overwrite (static overwrite would wipe the siblings —
    # the hash catches both failure directions)
    "backfill_partition_overwrite_roundtrip",
    # round 7: leakage-free point-in-time training-feature matrix
    # (pre-aggregate before the cutoff range join)
    "feature_snapshot_user_weekly",
    # round 7: exact-sum U-shaped multi-touch attribution (Hamilton
    # credits reconcile to 1M ppm per purchase)
    "multitouch_attribution_credit",
    # round 7: fourth §2.11 driver row — native session windows in
    # append mode across micro-batch cuts, flushed by the
    # watermark-advancing sentinel tick; batch twin pinned because its
    # oracle text moved into the shared session_window_oracle template
    "stream_session_window_parity",
    "session_window_batch",
    # round 7: k-anonymity release gate (suppression-only, one window
    # count; released histogram + suppressed audit row in one plan)
    "k_anonymous_event_release",
    # round 7: CUPED variance-reduced A/B readout (exact BIGINT moments
    # → deterministic theta; the trend_slope pattern)
    "ab_cuped_adjusted_value",
]
# Rotation note: with the r7 pin set the unpinned remainder re-verifies on
# a ~5-round tile cadence; the repo's own tri-scale differential
# (tools/oracle_check.py at sf0.001/0.01/0.1 + the ×10 fixture) is the
# full-registry gate in the meantime.


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
