"""EventSource seam (VERDICT r15 task 6): the SAME entity-fold pipeline
must replay-equal-batch over BOTH shipped source shapes — the parquet
file-tail (position = file set) and the Kafka-shaped offset topic
(position = per-partition offsets, maxOffsetsPerTrigger admission)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pasardassist_spark.operators.latest import latest_per_key
from pasardassist_spark.streaming.ingest import maintain_latest_state, read_state
from pasardassist_spark.streaming.sources import (
    FileEventSource,
    TopicEventSource,
    events_to_topic_rows,
)
from pasardassist_spark.tables import load

# events columns the fold needs, serialized into the topic value JSON
VALUE_DDL = "event_id long, user_id long, event_type string, value double, ts long"
COLS = ["event_id", "user_id", "event_type", "value", "ts"]


def _file_source(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").select(*COLS)
    raw = ev.withColumn("ts", F.expr("unix_micros(ts) * CAST(1000 AS BIGINT)"))
    src = str(tmp_path / "files")
    os.makedirs(src)
    for i in range(4):
        raw.filter(F.pmod(F.col("event_id"), F.lit(4)) == i).coalesce(1).write.parquet(
            str(tmp_path / f"c{i}")
        )
        (pq,) = [f for f in os.listdir(tmp_path / f"c{i}") if f.endswith(".parquet")]
        os.rename(os.path.join(tmp_path / f"c{i}", pq), os.path.join(src, f"part{i}.parquet"))
    return FileEventSource(src, max_files_per_trigger=1)


def _topic_source(spark, sf_dir, tmp_path, cap=None):
    from pasardassist_spark.sources.topiclog import write_topic

    rows = load(spark, sf_dir, "events").select(*COLS).collect()
    topic = str(tmp_path / "topic")
    write_topic(events_to_topic_rows(rows), topic, n_partitions=4)
    return TopicEventSource(topic, VALUE_DDL, max_offsets_per_trigger=cap)


@pytest.mark.parametrize("shape", ["file", "topic"])
def test_replay_equals_batch_over_both_source_shapes(spark, sf_dir, tmp_path, shape):
    src = (
        _file_source(spark, sf_dir, tmp_path)
        if shape == "file"
        else _topic_source(spark, sf_dir, tmp_path)
    )
    state_dir = str(tmp_path / "state")
    q = maintain_latest_state(src.stream(spark), state_dir, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    got = read_state(spark, state_dir).select(*COLS)
    want = latest_per_key(
        load(spark, sf_dir, "events").select(*COLS),
        ["user_id"],
        [F.desc("ts"), F.desc("event_id")],
    )
    g = sorted(map(str, got.collect()))
    w = sorted(map(str, want.collect()))
    assert g == w


def test_topic_offset_cap_bounds_batches_and_cutover(spark, sf_dir, tmp_path):
    """maxOffsetsPerTrigger must bound every micro-batch, and records
    APPENDED while the query is down must be picked up from the
    checkpointed offsets on restart (catch-up -> cutover as source
    semantics) with no loss and no re-read."""
    from pasardassist_spark.sources.topiclog import append_topic, write_topic

    ev = load(spark, sf_dir, "events").select(*COLS)
    head = [r for r in ev.limit(200).collect()]
    topic = str(tmp_path / "topic")
    write_topic(events_to_topic_rows(head[:150]), topic, n_partitions=4)

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src = TopicEventSource(topic, VALUE_DDL, max_offsets_per_trigger=40)

    def start():
        return (
            src.stream(spark)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    q.stop()
    assert len(progress) >= 4, f"expected >=4 capped batches, got {len(progress)}"
    assert max(p["numInputRows"] for p in progress) <= 40
    assert spark.read.parquet(sink).count() == 150

    append_topic(events_to_topic_rows(head[150:]), topic, n_partitions=4)
    q = start()
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(sink)
    assert out.count() == 200
    assert out.select("event_id").distinct().count() == 200  # exactly-once


def test_topic_batch_read_matches_store(spark, sf_dir, tmp_path):
    """The batch half of the Kafka-shaped source: one Spark partition per
    topic partition, all records, offsets dense per partition."""
    from pasardassist_spark.sources.topiclog import TopicLogDataSource, write_topic

    rows = load(spark, sf_dir, "events").select(*COLS).limit(100).collect()
    topic = str(tmp_path / "topic")
    write_topic(events_to_topic_rows(rows), topic, n_partitions=4)
    spark.dataSource.register(TopicLogDataSource)
    df = spark.read.format("topiclog").option("path", topic).load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    per = df.groupBy("partition").agg(
        F.count("*").alias("n"), F.max("offset").alias("mx")
    )
    for r in per.collect():
        assert r.mx == r.n - 1, "offsets must be dense per partition"


def test_torn_tail_line_never_admitted(tmp_path):
    """end_offsets must count only newline-TERMINATED lines: a concurrent
    writer can flush mid-record at a buffer boundary, and admitting the
    torn fragment as an offset makes _read_slice's json.loads fail the
    micro-batch (r17 review). The torn tail is admitted only once its
    newline lands, including through the incremental count cache."""
    import json
    import os

    from pasardassist_spark.sources.topiclog import end_offsets

    topic = tmp_path / "topic"
    os.makedirs(topic)
    f = topic / "p0.jsonl"
    full = json.dumps({"key": "k", "value": "v", "timestamp": 1}) + "\n"
    torn = '{"key": "k", "va'  # flushed mid-record, no newline yet
    with open(f, "w") as fh:
        fh.write(full * 2)
        fh.write(torn)
    assert end_offsets(str(topic)) == {0: 2}, "torn tail must not count"
    # writer completes the record: the suffix (tail remainder + newline)
    # is counted by the incremental pass, not a full recount
    with open(f, "a") as fh:
        fh.write('lue": "v2", "timestamp": 2}\n')
    assert end_offsets(str(topic)) == {0: 3}
    # and another torn fragment after it still isn't admitted
    with open(f, "a") as fh:
        fh.write('{"key"')
    assert end_offsets(str(topic)) == {0: 3}


def test_kafka_twin_gate(spark):
    """KafkaEventSource is the import-gated format("kafka") swap of
    TopicEventSource (mirror of delta_sink's gating): without the
    spark-sql-kafka jar stream() must raise an ACTIONABLE error naming
    the package, never fall through to a broken reader."""
    from pasardassist_spark.streaming.sources import (
        KafkaEventSource,
        kafka_available,
    )

    src = KafkaEventSource(
        "broker:9092", "events", VALUE_DDL, max_offsets_per_trigger=100
    )
    # reader construction itself needs no jar — options are lazy
    assert src.reader(spark) is not None
    if kafka_available(spark):
        pytest.skip("kafka connector present: gate test is for its absence")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        src.stream(spark)


def test_kafka_wire_projection_conformance(spark, sf_dir):
    """The projection both sources share (project_event_value) must decode
    Kafka's WIRE schema — key/value BINARY plus topic/partition/offset/
    timestamp/timestampType — to the canonical events rows, with no
    broker involved: build that exact frame from the same records the
    topic carries and pin row equality against the batch table. With
    this green, swapping TopicEventSource for KafkaEventSource changes
    only the reader construction (same option name for the rate cap,
    same value contract, same downstream plan)."""
    from pasardassist_spark.streaming.sources import project_event_value

    ev = load(spark, sf_dir, "events").select(*COLS).limit(200)
    want = {tuple(r) for r in ev.collect()}
    recs = events_to_topic_rows(ev.collect())
    wire = spark.createDataFrame(
        [
            (
                k.encode(), v.encode(), "events", hash(k) % 4, i,
                None, 0,
            )
            for i, (k, v, _ts) in enumerate(recs)
        ],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int",
    )
    got_df = project_event_value(wire, VALUE_DDL)
    assert [f.name for f in got_df.schema.fields] == COLS
    assert dict(got_df.dtypes)["ts"] == "timestamp"
    got = {tuple(r) for r in got_df.collect()}
    assert got == want
