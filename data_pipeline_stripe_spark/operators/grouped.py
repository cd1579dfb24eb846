"""Grouped-map operators: per-group pandas transforms via applyInPandas.

The rule of thumb (guide: UDFs are the slow path): anything expressible
as window/agg expressions stays JVM-side; applyInPandas is for per-group
logic that genuinely needs imperative/pandas semantics (model scoring,
complex resampling, scipy calls). ``zscore_per_group`` exists in BOTH
forms so tests can pin their equivalence — and so the cost of choosing
the pandas path is visible in benchmarks rather than assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def zscore_per_group_native(df: DataFrame, key: str, value: str) -> DataFrame:
    """JVM window implementation: z = (x - mean_g) / stddev_g."""
    w = W.partitionBy(key)
    z = (F.col(value) - F.avg(value).over(w)) / F.stddev_samp(value).over(w)
    return df.select(key, value, F.round(z, 6).alias("zscore"))


def zscore_per_group_pandas(df: DataFrame, key: str, value: str) -> DataFrame:
    """applyInPandas implementation: each group arrives as one pandas
    DataFrame (group must fit in executor memory — the documented
    constraint of the grouped-map model)."""
    import pandas as pd

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value]
        pdf = pdf[[key, value]].copy()
        pdf["zscore"] = ((x - x.mean()) / x.std(ddof=1)).round(6)
        return pdf

    # derive the declared schema from the INPUT types — hardcoding
    # string/double would make Arrow reject (or silently coerce) any
    # long-keyed or decimal-valued frame the native twin handles fine
    key_t = df.schema[key].dataType.simpleString()
    val_t = df.schema[value].dataType.simpleString()
    schema = f"{key} {key_t}, {value} {val_t}, zscore double"
    return df.select(key, value).groupBy(key).applyInPandas(norm, schema)
