"""Unit tests for composed operators (operators/)."""

from datetime import datetime

from data_pipeline_stripe_spark.operators import asof_join


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "u1", datetime(2024, 1, 10)),
         (2, "u1", datetime(2024, 1, 20)),
         (3, "u2", datetime(2024, 1, 10)),
         (4, "u3", datetime(2024, 1, 10))],     # u3 has no right rows
        "id long, key string, t timestamp",
    )
    right = spark.createDataFrame(
        [("u1", datetime(2024, 1, 5), 100.0),
         ("u1", datetime(2024, 1, 15), 200.0),
         ("u1", datetime(2024, 1, 20), 300.0),  # equal time → included (<=)
         ("u2", datetime(2024, 1, 11), 400.0)], # after u2's event → excluded
        "key string, rt timestamp, v double",
    )
    out = asof_join(left, right, on="key", left_time="t", right_time="rt",
                    payload=["v"])
    rows = {r.id: r.v_asof for r in out.collect()}
    assert rows == {1: 100.0, 2: 300.0, 3: None, 4: None}
    assert out.columns == ["id", "key", "t", "v_asof"]


def test_zscore_grouped_map_matches_native_window(spark):
    """applyInPandas grouped-map and the JVM window form must agree
    (pandas std ddof=1 == stddev_samp)."""
    from data_pipeline_stripe_spark.operators import (
        zscore_per_group_native,
        zscore_per_group_pandas,
    )
    from data_pipeline_stripe_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    native = {(r.event_type, r.value): r.zscore for r in
              zscore_per_group_native(ev, "event_type", "value").collect()}
    pandas_ = {(r.event_type, r.value): r.zscore for r in
               zscore_per_group_pandas(ev, "event_type", "value").collect()}
    assert set(native) == set(pandas_)
    for k, v in native.items():
        assert abs(v - pandas_[k]) <= 1e-5


def test_asof_join_tie_on_equal_right_times(spark):
    left = spark.createDataFrame([(1, "k", datetime(2024, 1, 2))],
                                 "id long, key string, t timestamp")
    right = spark.createDataFrame(
        [("k", datetime(2024, 1, 1), 1.0), ("k", datetime(2024, 1, 1), 9.0)],
        "key string, rt timestamp, v double",
    )
    out = asof_join(left, right, on="key", left_time="t", right_time="rt",
                    payload=["v"])
    # deterministic winner among same-time right rows: max payload
    assert out.collect()[0].v_asof == 9.0
