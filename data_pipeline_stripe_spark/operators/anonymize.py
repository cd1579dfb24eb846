"""k-anonymity by suppression — the release gate a training-data or
analytics export runs before rows leave the governed zone: any row whose
quasi-identifier combination occurs fewer than ``k`` times in the
release is suppressed, so no released row is distinguishable from at
least k−1 others on those columns (Sweeney's k-anonymity, the
suppression-only variant — no generalization hierarchy needed, and the
result is trivially k-anonymous by construction).

Scale shape: ONE window count over the quasi-identifier partitioning —
no join, no second scan; the filter rides the same shuffle. At 100 TB
the quasi combination is the natural partition key and the window's
count is map-side cheap (it is a full-partition frame, not an ordered
running frame).

Reference scope: beyond the reference (X-surface / governance, with
quality gates and PII redaction) — its ETL exports raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ._names import free_name


def k_anonymize(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """Rows whose ``quasi_cols`` combination appears < ``k`` times are
    dropped (suppressed). NULL quasi values group together (standard
    groupBy semantics): a NULL combo is released only if ≥ k rows share
    it. Returns the released rows with original columns unchanged."""
    if k < 1:
        raise ValueError(f"k_anonymize: k must be >= 1, got {k}")
    n_c = free_name(df.columns, "_kn")
    w = W.partitionBy(*quasi_cols)
    return (
        df.withColumn(n_c, F.count("*").over(w))
        .filter(F.col(n_c) >= k)
        .drop(n_c)
    )
