"""Registry invariants: the rotation policy must never lose a query, and
this round's changed queries must sit inside the driver's 50-entry
correctness window."""

from data_pipeline_stripe_spark.queries import (COVERAGE_DEBT_THIS_ROUND,
                                                PRIORITY_THIS_ROUND, REGISTRY)

WINDOW = 50


def _head() -> list[str]:
    pinned = [n for n in PRIORITY_THIS_ROUND if n in REGISTRY]
    debt = [n for n in COVERAGE_DEBT_THIS_ROUND
            if n in REGISTRY and n not in pinned]
    return pinned + debt


def test_rotation_preserves_every_query():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    # every registered query still has a callable and its oracle flag
    for q in REGISTRY.values():
        assert callable(q.fn)


def test_priority_and_debt_queries_inside_correctness_window():
    window = list(REGISTRY)[:WINDOW]
    for name in PRIORITY_THIS_ROUND:
        assert name in REGISTRY, f"stale PRIORITY entry {name!r}"
        assert name in window, f"{name!r} fell outside the driver window"
    for name in COVERAGE_DEBT_THIS_ROUND:
        assert name in REGISTRY, f"stale DEBT entry {name!r}"
        assert name in window, f"debt {name!r} fell outside the window"
    # debt entries are unchanged queries; a changed query belongs in pins
    assert not set(COVERAGE_DEBT_THIS_ROUND) & set(PRIORITY_THIS_ROUND)


def test_rotation_tiles_full_registry_without_starvation():
    """The rotation step equals the number of visible rotating slots
    (WINDOW - len(pins + debt)), so consecutive rounds tile the
    non-head queries contiguously: within ceil(len(rest)/slots) rounds
    every query has re-entered the window, from ANY starting round (no
    starvation). The debt tier shrinks the per-round slots but never
    breaks the tiling property."""
    import math

    names = list(REGISTRY)
    head = _head()
    rest = [n for n in names if n not in head]
    slots = WINDOW - len(head)
    assert slots >= 1, "pins + coverage debt exceed the driver window"
    step = max(1, slots)
    k = math.ceil(len(rest) / slots)
    for start in range(10):
        seen = set()
        for r in range(start, start + k):
            seen |= {rest[(r * step + i) % len(rest)] for i in range(slots)}
        assert seen == set(rest), f"rounds {start}..{start + k - 1} leave gaps"
