"""Streaming debounce (applyInPandasWithState) must emit exactly the
burst-opener rows the batch window form computes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pasardassist_spark.queries.analytics import dedup_debounce
from pasardassist_spark.streaming.debounce import debounce_stream
from pasardassist_spark.tables import load


def test_stream_debounce_equals_batch(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")
    raw = ev.withColumn("ts", F.expr("unix_micros(ts) * CAST(1000 AS BIGINT)"))

    # far-future sentinel per (user, type) seals every real burst
    far = raw.agg(F.max("ts")).first()[0] + 10 * 86400 * 1_000_000_000
    sentinels = (
        ev.select("user_id", "event_type").distinct()
        .select(
            (
                F.monotonically_increasing_id() + 50_000_000
            ).alias("event_id"),
            F.lit(far).cast("long").alias("ts"),
            "user_id",
            "event_type",
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
    out = debounce_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("debounced")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    sentinel_us = far // 1000
    got = {
        (r.user_id, r.event_type, r.event_id, r.ts, r.n_suppressed)
        for r in spark.sql("SELECT * FROM debounced").collect()
        if r.event_id < 50_000_000
    }
    want = {
        (r.user_id, r.event_type, r.event_id, r.ts, r.n_suppressed)
        for r in dedup_debounce(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0
