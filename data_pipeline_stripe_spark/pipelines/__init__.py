"""The three reference reports, rebuilt as composable DataFrame pipelines
over the reference-domain schemas (schemas.py §1). Each pipeline is a pure
function (DataFrames in → DataFrame out) plus a partitioned-sink writer —
the reference's collect-distinct-loop-refilter-write pattern
(top10.py:260-278, platform_usage.py:197-239) becomes ONE write action.
"""

from .top10 import top10_report, write_top10_csv
from .platform_usage import usage_report, write_usage_parquet
from .royalties import royalties_report, write_royalties_json

__all__ = [
    "top10_report", "write_top10_csv",
    "usage_report", "write_usage_parquet",
    "royalties_report", "write_royalties_json",
]
