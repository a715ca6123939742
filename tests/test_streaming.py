"""Replay-equals-batch tests (SURVEY.md §5.2): the streaming ingestion must
converge to exactly the state a batch recomputation produces — the
reference's DataCheckService reconciliation idea turned into a test."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pasardassist_spark.operators.latest import latest_per_key
from pasardassist_spark.streaming import (
    maintain_latest_state,
    read_event_stream,
    read_state,
    streaming_day_rollup,
)
from pasardassist_spark.tables import load


@pytest.fixture()
def chunked_events(spark, sf_dir, tmp_path):
    """Events split into 4 time-ordered parquet chunks to force multiple
    micro-batches (maxFilesPerTrigger=1 => 4 epochs)."""
    ev = load(spark, sf_dir, "events")
    src = str(tmp_path / "stream_src")
    n = ev.count()
    chunk = n // 4 + 1
    # long-nanos ts on disk, mirroring the driver's file layout
    raw = ev.withColumn("ts", F.expr("unix_micros(ts) * CAST(1000 AS BIGINT)"))
    rows = raw.orderBy("ts", "event_id").collect()
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, raw.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(src, f"chunk{i}"))
    # flatten: streaming file source wants files in one dir
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    idx = 0
    for root, _, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                os.rename(os.path.join(root, f), os.path.join(flat, f"part{idx}.parquet"))
                idx += 1
    assert idx == 4
    return flat


def _run_stream_to_state(spark, src, tmp_path, tag):
    state_dir = str(tmp_path / f"state_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = maintain_latest_state(stream, state_dir, ckpt)
    q.processAllAvailable()
    q.stop()
    return state_dir


def test_replay_equals_batch(spark, sf_dir, tmp_path, chunked_events):
    state_dir = _run_stream_to_state(spark, chunked_events, tmp_path, "a")
    got = read_state(spark, state_dir)
    want = latest_per_key(
        load(spark, sf_dir, "events"), ["user_id"], [F.desc("ts"), F.desc("event_id")]
    )
    g = sorted(map(str, got.select(*sorted(got.columns)).collect()))
    w = sorted(map(str, want.select(*sorted(want.columns)).collect()))
    assert g == w


def test_replay_is_idempotent(spark, sf_dir, tmp_path, chunked_events):
    s1 = _run_stream_to_state(spark, chunked_events, tmp_path, "x")
    s2 = _run_stream_to_state(spark, chunked_events, tmp_path, "y")
    a = sorted(map(str, read_state(spark, s1).collect()))
    b = sorted(map(str, read_state(spark, s2).collect()))
    assert a == b


def test_streaming_day_rollup_equals_batch(spark, sf_dir, tmp_path, chunked_events):
    stream = read_event_stream(spark, chunked_events, max_files_per_trigger=2)
    agg = streaming_day_rollup(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("day_rollup")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (str(r.day), r.n_events, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM day_rollup").collect()
    }
    ev = load(spark, sf_dir, "events")
    want = {
        (str(r.day), r.n_events, round(r.total_value, 6))
        for r in ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .collect()
    }
    assert got == want
