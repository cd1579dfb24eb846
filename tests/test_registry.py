"""Registry invariants: the rotation policy must never lose a query, and
this round's changed queries must sit inside the driver's 50-entry
correctness window."""

from data_pipeline_stripe_spark.queries import PRIORITY_THIS_ROUND, REGISTRY

WINDOW = 50


def test_rotation_preserves_every_query():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    # every registered query still has a callable and its oracle flag
    for q in REGISTRY.values():
        assert callable(q.fn)


def test_priority_queries_inside_correctness_window():
    window = list(REGISTRY)[:WINDOW]
    for name in PRIORITY_THIS_ROUND:
        assert name in REGISTRY, f"stale PRIORITY entry {name!r}"
        assert name in window, f"{name!r} fell outside the driver window"


def test_rotation_tiles_full_registry_without_starvation():
    """The rotation step equals the number of visible rotating slots
    (WINDOW - pinned), so consecutive rounds tile the non-pinned queries
    contiguously: within ceil(len(rest)/slots) rounds every query has
    re-entered the window, from ANY starting round (no starvation)."""
    import math

    names = list(REGISTRY)
    pinned = [n for n in PRIORITY_THIS_ROUND if n in REGISTRY]
    rest = [n for n in names if n not in pinned]
    slots = WINDOW - len(pinned)
    assert slots >= 1, "pinned list exceeds the driver window"
    step = max(1, slots)
    k = math.ceil(len(rest) / slots)
    for start in range(10):
        seen = set()
        for r in range(start, start + k):
            seen |= {rest[(r * step + i) % len(rest)] for i in range(slots)}
        assert seen == set(rest), f"rounds {start}..{start + k - 1} leave gaps"
