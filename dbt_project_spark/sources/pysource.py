"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic-events generator with real partition planning and source-side
filter pushdown.

This is the pure-Python analogue of the reference's Kafka producer
scripts (kafka_producer.py generates synthetic web events): instead of
producing to a broker, the generator IS a table — `spark.read.format(
"synth_events").option("rows", N).option("parts", P)` plans P input
partitions that generate disjoint id ranges in parallel on executors,
so a 10^12-row synthetic corpus needs no driver materialization and no
storage at all.

Spark 4.1 feature coverage:
- ``partitions()`` → one InputPartition per id stride (parallel scan),
- ``pushFilters()`` → EqualTo(event_type) is absorbed into generation
  (rows that fail the predicate are never created — the Python-source
  equivalent of parquet predicate pushdown); all other filters are
  returned to Spark to evaluate post-scan. Requires
  ``spark.sql.python.filterPushdown.enabled=true`` (Spark refuses a
  pushFilters implementation when the flag is off).

Determinism: all columns derive from md5(event_id) via the same
integer arithmetic on every run and partitioning — the generated table
is a pure function of (rows, parts).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _row(i: int):
    h = int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[:8], "big", signed=False
    )
    event_type = EVENT_TYPES[h % len(EVENT_TYPES)]
    user_id = (h >> 8) % 1000
    value = ((h >> 24) % 100_000) / 100.0
    return (i, user_id, event_type, value)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 4))
        self.only_type: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                self.only_type = f.value
            else:
                yield f  # unsupported → Spark evaluates it post-scan

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition: InputPartition):
        for i in range(partition.value, self.rows, self.parts):
            row = _row(i)
            if self.only_type is not None and row[2] != self.only_type:
                continue
            yield row


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register_synth_source(spark) -> None:
    """Register the synth_events format on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader (Spark 4
    SimpleDataSourceStreamReader): the pure-Python analogue of the
    reference's INFINITE producer (kafka_producer_streaming.py) — a
    rate-source-like stream whose rows are the SAME deterministic
    md5-derived events as the batch table, so stream output is
    replayable and batch-comparable by construction.

    Offsets are row counters ({"i": next_id}): ``read`` emits the
    next ``batch_rows`` ids and advances; ``readBetweenOffsets``
    regenerates any offset range bit-identically (exactly-once replay
    after failure — possible ONLY because generation is a pure
    function of the id, the property a real Kafka source gets from
    the broker's log)."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batchrows", 100))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = lo + self.batch_rows
        return (iter([_row(i) for i in range(lo, hi)]), {"i": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["i"]), int(end["i"]))])
