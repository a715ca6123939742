"""Event-source abstraction seam (VERDICT r15 task 6): the streaming
pipelines consume an ``EventSource``, not a hard-coded file glob, so
catch-up/cutover (ST1/S2) is testable against more than one source SHAPE.

Two shipped shapes:

- :class:`FileEventSource` — the parquet file-tail twin
  (streaming/ingest.read_event_stream): position = processed file set,
  rate cap = maxFilesPerTrigger. The sandbox default.
- :class:`TopicEventSource` — the Kafka-shaped offset log
  (sources/topiclog.py): position = per-partition offset map, rate cap =
  maxOffsetsPerTrigger, value parsed with from_json. On a real cluster
  this implementation swaps its format string for ``kafka`` + bootstrap
  options; the projection and every pipeline downstream are unchanged.

Both yield the SAME events-schema streaming DataFrame (ts normalized to
TIMESTAMP by the identical rule the batch scan uses), so
replay-equals-batch holds source-independently —
tests/test_streaming_sources.py parameterizes exactly that.
"""

from __future__ import annotations

import json
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession, functions as F


class EventSource(Protocol):
    """Anything that can open the event log as a streaming DataFrame in
    the canonical events schema."""

    def stream(self, spark: SparkSession) -> DataFrame: ...


class FileEventSource:
    """Parquet file-tail source (position = file set, cap = files/trigger)."""

    def __init__(self, src_dir: str, max_files_per_trigger: int = 1):
        self.src_dir = src_dir
        self.max_files_per_trigger = max_files_per_trigger

    def stream(self, spark: SparkSession) -> DataFrame:
        from pasardassist_spark.streaming.ingest import read_event_stream

        return read_event_stream(
            spark, self.src_dir, max_files_per_trigger=self.max_files_per_trigger
        )


class TopicEventSource:
    """Kafka-shaped source (position = per-partition offsets, cap =
    offsets/trigger). ``value`` is the event row as JSON with ``ts`` in
    epoch MICROS (what a Kafka connect dump of the event log carries);
    the projection parses it with from_json against the supplied DDL and
    restores the TIMESTAMP event time — the same normalization contract
    as the batch scan."""

    def __init__(
        self,
        topic_dir: str,
        value_ddl: str,
        max_offsets_per_trigger: int | None = None,
    ):
        self.topic_dir = topic_dir
        self.value_ddl = value_ddl
        self.max_offsets_per_trigger = max_offsets_per_trigger

    def stream(self, spark: SparkSession) -> DataFrame:
        from pasardassist_spark.sources.topiclog import TopicLogDataSource

        spark.dataSource.register(TopicLogDataSource)
        r = spark.readStream.format("topiclog").option("path", self.topic_dir)
        if self.max_offsets_per_trigger is not None:
            r = r.option("maxOffsetsPerTrigger", self.max_offsets_per_trigger)
        parsed = r.load().select(
            F.from_json(F.col("value"), self.value_ddl).alias("v")
        ).select("v.*")
        if dict(parsed.dtypes).get("ts") == "bigint":
            parsed = parsed.withColumn("ts", F.expr("timestamp_micros(ts)"))
        return parsed


def events_to_topic_rows(rows, ts_col: str = "ts") -> list[tuple]:
    """Adapt collected event Rows to (key, value_json, timestamp) topic
    records: key = user_id (keeps a user's events ordered within one
    partition, the Kafka keyed-partitioner contract the entity fold
    relies on), value = the full row as JSON with ``ts`` as epoch micros."""
    out = []
    for r in rows:
        d = r.asDict()
        ts = d.get(ts_col)
        us = None
        if ts is not None:
            us = int(ts.timestamp() * 1_000_000) if hasattr(ts, "timestamp") else int(ts)
        d[ts_col] = us
        out.append((str(d.get("user_id")), json.dumps(d, default=str), us))
    return out
