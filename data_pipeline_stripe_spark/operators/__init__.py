"""Relational operators Spark has no single primitive for, composed from
DataFrame ops (preference order per the build spec: composition first,
Pandas UDF second, mapPartitions last)."""

from .asof import asof_join
from .range_join import range_join
from .skew import salted_join, two_phase_agg

__all__ = ["asof_join", "range_join", "salted_join", "two_phase_agg"]
