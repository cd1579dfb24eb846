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
    # round 8 pins: all 29 r7 pins pruned (every one green in the r7
    # driver window / final-HEAD full differentials; code untouched
    # since). Pinned here = code changed THIS round (rule 1).
    #
    # round 8: the quota frame now carries the corpus's source-column
    # type (review fix in llm/sampling.py)
    "doc_mixture_resample",
    # round 8: typed sentinel defaults in the 4-batch scaffold; the
    # session-window gate is the one consuming the sentinel path
    "stream_session_window_parity",
    # round 8: the co-located layout became the royalties flagship —
    # 32 buckets (one scan task per core) + fingerprint-cached layout
    # write (build once per session, report many) + materialized
    # amount/month projection; the shared report tree also flattened
    # the dim snowflake into one broadcast, so the plain query and the
    # JSONL sink gate changed plans too
    "royalties_monthly_usd_bucketed",
    "royalties_monthly_usd",
    "royalties_json_roundtrip",
    # round 8: bounded multi-touch attribution — explode(≤N seqs) +
    # equi-join instead of the pair range join; quadratic oracle spec,
    # linear Spark plan
    "multitouch_attribution_topn",
    # round 8: the pandas top-k kernel's query side now streams in
    # bounded chunks (no whole-batch collect)
    "embedding_topk_cosine_pandas",
    # round 8: fifth §2.11 driver row — checkpoint RESTART recovery:
    # the stateful drain is killed mid-stream by an injected sink crash
    # and a second query recovers from the checkpoint; the hash proves
    # state rebuild + exactly-once epoch replay
    "stream_restart_recovery_parity",
    # round 8: ANN index-quality audit — per-query recall@5 of the IVF
    # path vs the exact baseline, composed from the two gated queries'
    # own fns and oracles (integer ppm, left-join keeps zero-hit rows)
    "embedding_ann_recall_audit",
    # round 8: the snapshot-table commit protocol (immutable manifests
    # + atomic pointer swap) proven by a three-version time-travel
    # round trip — closes the "table format" gap with working code
    "snapshot_time_travel_roundtrip",
    # round 8: sixth §2.11 driver row — exactly-once streaming sink via
    # epoch-keyed idempotent snapshot commits; the injected crash fires
    # AFTER the commit, so the replay window itself is what the hash
    # proves
    "stream_snapshot_sink_parity",
]
# Rotation note: with the r8 pin set (11 pins), 39 rotating slots tile the
# unpinned remainder in ~5 rounds; the repo's own tri-scale differential
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
