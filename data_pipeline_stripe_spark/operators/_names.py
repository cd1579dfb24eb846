"""Column-name hygiene shared by the operator modules.

Two rules (the gapfill/asof lesson from the round-5 review — a
``withColumn`` on a name the caller already owns silently REPLACES the
caller's column, and the operator then drops it):

- internal working columns are derived with :func:`free_name` so they
  can never collide with caller columns;
- output-contract columns (names the operator's result claims) are
  checked with :func:`reject_reserved` and fail LOUDLY if the input
  already uses them — the caller must rename, because silently
  overwriting data is worse than an error.
"""

from __future__ import annotations

from collections.abc import Iterable


def free_name(taken: Iterable[str], base: str) -> str:
    """A name not present in ``taken``, derived by prefixing
    underscores to ``base`` (same derivation as asof.py / gapfill.py)."""
    taken = set(taken)
    name = base
    while name in taken:
        name = "_" + name
    return name


def reject_reserved(columns: Iterable[str], reserved: Iterable[str],
                    op: str) -> None:
    """Raise if any output-contract ``reserved`` name is already a
    column (or key) of the input — the operator would otherwise
    silently overwrite or duplicate it."""
    clash = sorted(set(columns) & set(reserved))
    if clash:
        raise ValueError(
            f"{op}: input column(s) {clash} collide with the operator's "
            f"output contract {sorted(set(reserved))} — rename them")
