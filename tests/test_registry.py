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


def test_consecutive_rounds_cover_full_registry():
    """The rotation step guarantees any two consecutive rounds jointly
    cover every non-pinned query."""
    names = list(REGISTRY)
    pinned = [n for n in PRIORITY_THIS_ROUND if n in REGISTRY]
    rest = [n for n in names if n not in pinned]
    step = max(1, len(names) - WINDOW)
    slots = WINDOW - len(pinned)
    for r in range(10):  # any round r and r+1
        a = {rest[(r * step + i) % len(rest)] for i in range(slots)}
        b = {rest[((r + 1) * step + i) % len(rest)] for i in range(slots)}
        assert a | b == set(rest), f"rounds {r},{r + 1} leave gaps"
