"""Structured Streaming: the events source consumed incrementally must
reproduce the batch aggregates once the stream drains."""

import shutil

import pytest
from pyspark.sql import functions as F

from data_pipeline_stripe_spark import streaming
from data_pipeline_stripe_spark.sources import load_table


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def test_windowed_counts_match_batch(spark, sf_dir, stream_dir):
    stream = streaming.read_event_stream(spark, stream_dir)
    assert stream.isStreaming
    agg = streaming.windowed_event_counts(stream, window="1 hour")
    # complete mode: append would hold back windows the watermark hasn't
    # passed yet (the tail of a finite stream never finalizes)
    streaming.run_to_memory(agg, "win_counts", output_mode="complete")
    out = spark.sql("SELECT * FROM win_counts")
    total_streamed = out.agg(F.sum("n_events")).collect()[0][0]
    total_batch = load_table(spark, sf_dir, "events").count()
    assert total_streamed == total_batch
    # batch twin: same windowed aggregation over the static table
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    b = {(r.window_start, r.event_type): r.n_events for r in batch.collect()}
    s = {(r.window_start, r.event_type): r.n_events for r in out.collect()}
    assert s == b


def test_session_windows_smoke(spark, stream_dir):
    stream = streaming.read_event_stream(spark, stream_dir)
    agg = streaming.sessionized_event_counts(stream, gap="30 minutes")
    streaming.run_to_memory(agg, "sess_counts")
    rows = spark.sql("SELECT * FROM sess_counts").collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start and r.n_events > 0 for r in rows)
