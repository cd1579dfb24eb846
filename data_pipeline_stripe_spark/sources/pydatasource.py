"""Custom Python DataSource (Spark 4 API): executor-side dim ingestion.

The reference fetches its REST dims entirely ON THE DRIVER
(royalties.py:145-176 downloads every blob, parses JSON, then
parallelizes) — a bottleneck and an OOM risk the moment a dim grows.
The Spark 4 Python DataSource API is the engine-native fix: the dim is
declared as a FORMAT, each shard becomes an ``InputPartition``, and the
fetch/parse runs INSIDE the executor task that owns the shard, with
shard pruning pushed down from query filters. This module ships a
deterministic synthetic instance (`sharded_dim`) whose rows are a pure
integer function of (shard, row) so the DuckDB oracle can re-derive
them arithmetically; an HTTP-backed dim only swaps the body of
``_shard_rows`` for a per-shard GET — partitioning, pruning, and
schema handling are identical.

Scale shape: N shards → N parallel partition reads, no driver-side
data path at all; ``pushFilters`` prunes shards BEFORE tasks launch
(the Python-source analogue of partition pruning), gated by
``spark.sql.python.filterPushdown.enabled``.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)


class ShardPartition(InputPartition):
    def __init__(self, shard_id: int, rows_per_shard: int):
        self.shard_id = shard_id
        self.rows_per_shard = rows_per_shard


def _shard_rows(shard_id: int, rows_per_shard: int):
    """The per-shard payload, as a pure integer function of (shard, i):
    row_id = shard·R + i, code cycles through 7 currencies, and
    rate_micros = 500_000 + (row_id² mod 1_000_000) — re-derivable in
    any engine from ``range(shards · R)`` alone. An HTTP dim replaces
    this body with a GET + parse; nothing else changes."""
    for i in range(rows_per_shard):
        row_id = shard_id * rows_per_shard + i
        yield (
            shard_id,
            row_id,
            f"C{row_id % 7}",
            500_000 + (row_id * row_id) % 1_000_000,
        )


class ShardedDimReader(DataSourceReader):
    def __init__(self, options):
        self.n_shards = int(options.get("shards", 4))
        self.rows_per_shard = int(options.get("rows_per_shard", 100))
        self.keep: set[int] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Shard pruning: EqualTo/In on shard_id selects partitions up
        front; every other filter is reported unsupported and Spark
        re-applies it above the scan (pushdown here is a pure
        optimization, never a correctness dependency)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("shard_id",):
                picked = {int(f.value)}
                self.keep = picked if self.keep is None else (
                    self.keep & picked)
            elif isinstance(f, In) and f.attribute == ("shard_id",):
                picked = {int(v) for v in f.value}
                self.keep = picked if self.keep is None else (
                    self.keep & picked)
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        shards = range(self.n_shards) if self.keep is None else sorted(
            s for s in self.keep if 0 <= s < self.n_shards)
        return [ShardPartition(s, self.rows_per_shard) for s in shards]

    def read(self, partition: ShardPartition):
        return _shard_rows(partition.shard_id, partition.rows_per_shard)


class ShardedDimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sharded_dim"

    def schema(self) -> str:
        return ("shard_id int, row_id bigint, code string, "
                "rate_micros bigint")

    def reader(self, schema) -> ShardedDimReader:
        return ShardedDimReader(self.options)


def register(spark) -> None:
    """Idempotent registration (the driver hands each query a session it
    may reuse across queries; double-registering raises). Also enables
    Python-source filter pushdown — Spark refuses to plan a reader that
    implements pushFilters() while the conf is off (a loud failure, not
    a silent no-pushdown fallback)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    for source in (ShardedDimDataSource, EventFeedDataSource):
        try:
            spark.dataSource.register(source)
        except Exception:
            pass


# -- Streaming Python DataSource: executor-side micro-batch feed ------------

class FeedSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _feed_row(i: int):
    """Row i of the feed as a pure integer function — the oracle for any
    drained prefix is re-derivable from range(n) in any engine."""
    return (
        i,
        i % 50,
        ("signup", "click", "view", "purchase", "error")[i % 5],
        (i * i) % 1_000_000,
    )


class EventFeedStreamReader(DataSourceStreamReader):
    """Spark-4 streaming Python DataSource (the FULL executor-side API,
    not SimpleDataSourceStreamReader's driver-side convenience path):
    the driver only tracks integer offsets; each micro-batch's offset
    range splits into ``splits_per_batch`` InputPartitions whose rows
    are generated INSIDE executor tasks. ``max_rows`` bounds the feed so
    a test can drain it; a real feed (kafka-like HTTP cursor, queue)
    replaces ``latestOffset`` with a cursor probe and ``read`` with a
    per-slice fetch.

    Recovery contract: by default ``latestOffset`` reports the feed's
    true end (``max_rows``) — like a Kafka log-end probe, it is a pure
    function of the external feed, so a restarted query resumes at the
    CHECKPOINTED offset and plans exactly [committed, end): no replay,
    no backward offsets. Setting ``rows_per_batch`` turns on in-run
    PACING (the offset advances per trigger from a per-instance
    counter) purely to demonstrate multi-batch execution; pacing state
    does not survive a restart — the first post-restart latestOffset
    can sit below the committed offset, which Spark's offset log would
    reject — so paced mode is for bounded in-run demonstrations and
    tests only (the Python API has no ReadLimit to pace safely)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 0))
        self.max_rows = int(options.get("max_rows", 1000))
        self.splits = int(options.get("splits_per_batch", 4))
        self._offset = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        if self.rows_per_batch <= 0:
            return {"index": self.max_rows}
        self._offset = min(self._offset + self.rows_per_batch, self.max_rows)
        return {"index": self._offset}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["index"]), int(end["index"])
        n = max(1, self.splits)
        step = max(1, -(-(e - s) // n))
        return [FeedSlice(lo, min(lo + step, e))
                for lo in range(s, e, step)] or [FeedSlice(s, s)]

    def read(self, partition: FeedSlice):
        for i in range(partition.start, partition.end):
            yield _feed_row(i)

    def commit(self, end: dict) -> None:
        pass


class EventFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "event_feed"

    def schema(self) -> str:
        return ("event_id bigint, user_id bigint, event_type string, "
                "value_micros bigint")

    def streamReader(self, schema) -> EventFeedStreamReader:
        return EventFeedStreamReader(self.options)
