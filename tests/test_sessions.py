"""Streaming sessionization (applyInPandasWithState) must emit exactly the
sessions the batch window form computes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pasardassist_spark.streaming.sessions import sessionize_batch, sessionize_stream
from pasardassist_spark.tables import load


def test_stream_sessions_equal_batch(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")
    raw = ev.withColumn("ts", F.expr("unix_micros(ts) * CAST(1000 AS BIGINT)"))

    # sentinel far-future event per user forces every real session closed
    far = raw.agg(F.max("ts")).first()[0] + 10 * 86400 * 1_000_000_000
    sentinels = (
        ev.select("user_id").distinct()
        .select(
            (F.col("user_id") + 10_000_000).alias("event_id"),
            F.lit(far).cast("long").alias("ts"),
            "user_id",
            F.lit("view").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )

    src = str(tmp_path / "src")
    os.makedirs(src)

    def drop(df, i):
        staging = str(tmp_path / f"s{i}")
        df.coalesce(1).write.parquet(staging)
        (pq,) = [f for f in os.listdir(staging) if f.endswith(".parquet")]
        os.rename(os.path.join(staging, pq), os.path.join(src, f"p{i}.parquet"))

    rows = raw.orderBy("ts", "event_id").collect()
    half = len(rows) // 2
    drop(spark.createDataFrame(rows[:half], raw.schema), 0)
    drop(spark.createDataFrame(rows[half:], raw.schema), 1)
    drop(sentinels.select(*raw.columns), 2)

    from pasardassist_spark.streaming import read_event_stream

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    sentinel_us = far // 1000
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM sessions").collect()
        if r.session_start < sentinel_us
    }
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in sessionize_batch(ev).collect()
    }
    assert got == want


def test_sessionize_agrees_with_builtin_session_window(spark, sf_dir):
    """Cross-validation: the hand-rolled lag/running-sum sessionization
    must produce the same (user, n_events, total) session multiset as
    Spark's built-in session_window aggregation. (Boundary semantics
    differ only for a gap of EXACTLY 30 min — measure-zero with
    microsecond timestamps, absent from this data.)"""
    from pasardassist_spark.streaming.sessions import sessionize_batch
    from pasardassist_spark.tables import load

    ev = load(spark, sf_dir, "events")
    ours = sorted(
        (r.user_id, r.n_events, round(r.total_value, 6))
        for r in sessionize_batch(ev).collect()
    )
    builtin = sorted(
        (r.user_id, r.n_events, round(r.total_value, 6))
        for r in ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    )
    assert ours == builtin


def test_late_event_merges_pending_sessions(spark, tmp_path):
    """The finality guarantee (VERDICT r5 directive #4): a late-but-within-
    watermark event that lands in the gap between two in-state sessions
    must MERGE them before anything is emitted — the old eager-emission
    design would already have shipped the first session and been unable to
    retract it. Also pins the other half of the contract: nothing is
    emitted until the watermark seals a session."""
    from pasardassist_spark.streaming import read_event_stream

    NS = 1_000_000_000
    US = 1_000_000

    def drop(rows, i):
        df = spark.createDataFrame(
            [(eid, t * NS, 1, "view", v, "{}") for eid, t, v in rows],
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        )
        staging = str(tmp_path / f"s{i}")
        df.coalesce(1).write.parquet(staging)
        (pq,) = [f for f in os.listdir(staging) if f.endswith(".parquet")]
        os.rename(os.path.join(staging, pq), os.path.join(str(tmp_path / "src"), f"p{i}.parquet"))

    os.makedirs(str(tmp_path / "src"))
    # base offset keeps t well above the epoch-0 initial watermark (a
    # t=0 event sits ON the boundary and is dropped as late)
    B = 100_000
    # batch 0: t=B and t=B+3000s -> gap 3000s > 1800s: TWO sessions in
    # state; watermark after batch 0 = B+3000s-3600s < B, so the bridge
    # event below is still admissible
    drop([(1, B, 1.0), (2, B + 3000, 2.0)], 0)
    # batch 1: late bridge at t=B+1500s (<=1800s from both sides) -> ONE session
    drop([(3, B + 1500, 4.0)], 1)
    # batch 2: sentinel far ahead advances the watermark past B+3000s+gap
    drop([(4, 10 * 86400, 0.0)], 2)

    stream = read_event_stream(spark, str(tmp_path / "src"), max_files_per_trigger=1)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("merge_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = [
        (r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.sql(
            "SELECT * FROM merge_sessions WHERE session_start < 200000000000"
        ).collect()
    ]
    # one FINAL session spanning the bridge, all three events, exact sum
    assert got == [(B * US, (B + 3000) * US, 3, 7.0)]
