"""Relational operators Spark has no single primitive for, composed from
DataFrame ops (preference order per the build spec: composition first,
Pandas UDF second, mapPartitions last)."""

from .allocate import allocate_proportional
from .asof import asof_join
from .drift import psi_drift
from .pareto import pareto_frontier
from .sweep import interval_concurrency
from .gapfill import interpolate_daily
from .grouped import zscore_per_group_native, zscore_per_group_pandas
from .layout import compact_small_files, vacuum_partitions, write_clustered
from .quality import (accepted_values, foreign_key, in_range,
                      matches_regex, not_null, run_checks, unique)
from .range_join import range_join
from .scd import scd2_from_changes
from .sketches import (det_hll_estimate, histogram_percentiles,
                       hll_merge_partials, hll_partials, hll_rollup,
                       mad_stats)
from .skew import salted_join, two_phase_agg
from .zorder import z_cover, z_interleave, z_rectangle_filter

__all__ = [
    "asof_join", "range_join", "salted_join", "two_phase_agg",
    "zscore_per_group_native", "zscore_per_group_pandas",
    "hll_partials", "hll_rollup", "hll_merge_partials",
    "det_hll_estimate", "histogram_percentiles", "mad_stats",
    "write_clustered", "compact_small_files", "vacuum_partitions",
    "z_interleave", "z_cover", "z_rectangle_filter",
    "interpolate_daily",
    "run_checks", "not_null", "in_range", "accepted_values",
    "matches_regex", "unique", "foreign_key",
    "pareto_frontier", "allocate_proportional", "psi_drift",
    "interval_concurrency",
]
