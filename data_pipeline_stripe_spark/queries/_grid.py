"""Exact decimal-grid sums — the q7/q8/q10 pattern as a shared helper.

Float ``SUM`` is accumulation-order dependent, so ``ROUND(SUM(<double>), 2)``
can flip a cent whenever the exact sum sits one ulp from a rounding boundary
— the ×10 replicated-fixture differentials caught exactly that in q7 and
q10 (NOTES_r6). Every *compared* money/quantity sum therefore quantizes per
row to its value grid (prices 1e-2, price×(1−disc) 1e-4, ×(1+tax) 1e-6),
sums as BIGINT (associative under any partitioning on both engines), and
divides once at the end — the single IEEE division is identical everywhere.

BIGINT headroom: the largest grid (1e-6, sum_charge) is ≤1.1e11 per row, so
even the 60M-row ×100 fixture stays below 2^63 (6.8e18 < 9.2e18); at true
100 TB scale the grid constant drops a digit or the sum splits by key first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def grid_sum(expr: Column, g: int) -> Column:
    """SUM(expr) computed exactly on the 1/g decimal grid.

    Per-row ``ROUND(expr*g)`` is exact because expr's true value lies on
    the grid and the double product is within ~5e-5 of the integer — never
    near the .5 boundary.
    """
    return F.sum(F.round(expr * g).cast("long")) / float(g)


# The DuckDB oracle twin is written inline in each oracle string as
#   SUM(CAST(ROUND(expr * G) AS BIGINT)) / G.0
# (textually identical arithmetic on both engines); the registry lint
# test_no_compared_float_sum_in_oracles enforces the pattern, so there is
# deliberately no SQL-side helper to rot unused.
