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


def project_event_value(raw: DataFrame, value_ddl: str) -> DataFrame:
    """The SINGLE value-decoding projection shared by TopicEventSource and
    KafkaEventSource: parse the JSON ``value`` column against the events
    DDL and restore the TIMESTAMP event time from epoch micros — the same
    normalization contract as the batch scan. ONE implementation, so the
    Kafka swap is provably only the reader construction: every pipeline
    downstream of either source consumes the identical plan."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), value_ddl).alias("v")
    ).select("v.*")
    if dict(parsed.dtypes).get("ts") == "bigint":
        parsed = parsed.withColumn("ts", F.expr("timestamp_micros(ts)"))
    return parsed


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
        return project_event_value(r.load(), self.value_ddl)


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka-0-10 connector is on the session's
    classpath (the cluster deployment). Mirror of
    streaming/delta_sink.delta_available — gate, don't assume."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 - JVM probe
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001 - any JVM lookup failure means absent
        return False


class KafkaEventSource:
    """Real Kafka twin of :class:`TopicEventSource` — the swap-point the
    topiclog docstring promises. Identical value contract (JSON events
    row, ``ts`` epoch micros), identical rate-cap option name
    (maxOffsetsPerTrigger), and the IDENTICAL downstream projection via
    :func:`project_event_value` — the only delta is the reader
    construction (``format("kafka")`` + broker options). Import-gated
    exactly like streaming/delta_sink: this container has no
    spark-sql-kafka jar, so stream() raises an actionable error here and
    tests pin (a) the gate and (b) projection conformance on the Kafka
    wire schema (key/value BINARY + topic/partition/offset/timestamp),
    which needs no broker. Reference analog: the live event subscription
    S2 (tasks.service.ts:92-101)."""

    def __init__(
        self,
        bootstrap_servers: str,
        topic: str,
        value_ddl: str,
        max_offsets_per_trigger: int | None = None,
        starting_offsets: str = "earliest",
    ):
        self.bootstrap_servers = bootstrap_servers
        self.topic = topic
        self.value_ddl = value_ddl
        self.max_offsets_per_trigger = max_offsets_per_trigger
        self.starting_offsets = starting_offsets

    def reader(self, spark: SparkSession):
        """The format("kafka") reader, options configured — split from
        stream() so the construction is testable without a broker."""
        r = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("subscribe", self.topic)
            .option("startingOffsets", self.starting_offsets)
        )
        if self.max_offsets_per_trigger is not None:
            r = r.option("maxOffsetsPerTrigger", self.max_offsets_per_trigger)
        return r

    def stream(self, spark: SparkSession) -> DataFrame:
        if not kafka_available(spark):
            raise RuntimeError(
                "KafkaEventSource needs the spark-sql-kafka-0-10 connector "
                "on the classpath (spark.jars.packages="
                "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>); "
                "in environments without it use TopicEventSource, which "
                "implements the same offset/cap/value contract"
            )
        return project_event_value(self.reader(spark).load(), self.value_ddl)


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
