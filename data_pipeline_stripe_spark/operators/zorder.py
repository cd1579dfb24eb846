"""Z-order range decomposition: the READ side of the clustering story.

`zorder_key_orders` computes the Morton key and `write_clustered` lays
files out in disjoint key spans — but a reader's predicate arrives as a
RECTANGLE (x-range AND y-range), and a rectangle is not one z-interval.
This module covers the rectangle with a bounded set of z-intervals by
quadtree descent (the classic litmax/bigmin decomposition, expressed as
an aligned-cell cover): every z-aligned quadtree cell is a CONTIGUOUS
z-interval, so cells fully inside the rectangle emit their whole
interval, partial cells split into 4 children, and when the interval
budget runs out the remaining partial cells are emitted whole — a sound
over-approximation (never misses a row; the exact x/y residual filter
removes the overshoot). The resulting `zkey BETWEEN lo AND hi OR ...`
disjunction is plain comparison arithmetic, so it pushes into the
parquet scan and prunes row groups / files from footer min-max stats —
turning a two-dimensional selection into I/O proportional to the
rectangle, which is the entire point of the z-layout at 100 TB.

Budget trade-off: more intervals = tighter cover = fewer false-positive
row groups, but a wider pushed predicate. 32–128 intervals covers
typical rectangles to within a few percent overshoot (pinned by a
hypothesis property: full budget == exact cover).
"""

from __future__ import annotations

import functools
import operator
from collections import deque

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 16


def z_interleave(x: int, y: int, bits: int = BITS) -> int:
    """Morton key: x on even bits, y on odd — same layout as the SQL
    expression in queries/relational5.py (pinned invertible by
    tests/test_properties.py)."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def z_cover(x_lo: int, x_hi: int, y_lo: int, y_hi: int,
            bits: int = BITS, max_ranges: int = 64) -> list[tuple[int, int]]:
    """Cover the rectangle [x_lo,x_hi]×[y_lo,y_hi] with ≤ ~max_ranges
    contiguous z-intervals (inclusive bounds). Sound: every point in the
    rectangle has its z inside some interval. Exact when the budget
    allows full descent; otherwise partial cells are included whole."""
    if x_lo > x_hi or y_lo > y_hi:
        return []
    limit = (1 << bits) - 1
    if x_lo < 0 or y_lo < 0 or x_hi > limit or y_hi > limit:
        # The z-key encodes MASKED coordinates (e.g. custkey & 65535 in
        # relational5._Z_SPARK): bounds outside [0, 2^bits) cannot be
        # expressed as z-intervals and silently clamping would either
        # drop rows (aliased residues) or scan everything. The caller
        # must bucket/mask its dimension into the key domain first.
        raise ValueError(
            f"rectangle [{x_lo},{x_hi}]x[{y_lo},{y_hi}] outside the "
            f"{bits}-bit z-domain [0,{limit}] — mask or bucket the "
            "dimension to the key domain before decomposing")
    out: list[tuple[int, int]] = []
    queue: deque[tuple[int, int, int]] = deque([(0, 0, 0)])  # depth, xp, yp
    while queue:
        d, xp, yp = queue.popleft()
        shift = bits - d
        x0, y0 = xp << shift, yp << shift
        x1, y1 = x0 + (1 << shift) - 1, y0 + (1 << shift) - 1
        if x1 < x_lo or x0 > x_hi or y1 < y_lo or y0 > y_hi:
            continue
        inside = x0 >= x_lo and x1 <= x_hi and y0 >= y_lo and y1 <= y_hi
        if inside or d == bits or len(out) + len(queue) >= max_ranges:
            out.append((z_interleave(x0, y0, bits),
                        z_interleave(x1, y1, bits)))
        else:
            for dy in (0, 1):
                for dx in (0, 1):
                    queue.append((d + 1, xp * 2 + dx, yp * 2 + dy))
    if not out:
        return []
    out.sort()
    merged = [out[0]]
    for lo, hi in out[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def z_rectangle_filter(zcol: str, x_expr: Column, y_expr: Column,
                       x_lo: int, x_hi: int, y_lo: int, y_hi: int,
                       bits: int = BITS, max_ranges: int = 64) -> Column:
    """Filter for "x in [x_lo,x_hi] AND y in [y_lo,y_hi]" over a
    z-clustered table: the z-interval disjunction does the pruning (it
    pushes to the scan and hits footer stats), the exact x/y residual
    keeps the semantics exact regardless of cover budget."""
    ranges = z_cover(x_lo, x_hi, y_lo, y_hi, bits, max_ranges)
    if not ranges:
        return F.lit(False)
    z = F.col(zcol)
    z_pred = functools.reduce(
        operator.or_, [(z >= lo) & (z <= hi) for lo, hi in ranges])
    residual = (x_expr >= x_lo) & (x_expr <= x_hi) \
        & (y_expr >= y_lo) & (y_expr <= y_hi)
    return z_pred & residual
