"""Streaming CEP (applyInPandasWithState) must emit exactly the matches
the batch window operator computes, each exactly once, sealed by the
watermark — including when a LATE event breaks a would-be match."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pasardassist_spark.operators.cep import match_pattern
from pasardassist_spark.streaming.cep import match_pattern_stream
from pasardassist_spark.tables import load

WITHIN_US = 3_600_000_000


def _steps():
    return [F.col("event_type") == "view", F.col("event_type") == "click"]


def test_stream_matches_equal_batch(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")
    raw = ev.withColumn("ts", F.expr("unix_micros(ts) * CAST(1000 AS BIGINT)"))

    # far-future sentinel per user pushes the watermark past every real
    # event; event_type 'flush' matches no step, so it can only SEAL
    far = raw.agg(F.max("ts")).first()[0] + 10 * 86400 * 1_000_000_000
    sentinels = ev.select("user_id").distinct().select(
        (F.col("user_id") + 10_000_000).alias("event_id"),
        F.lit(far).cast("long").alias("ts"),
        "user_id",
        F.lit("flush").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )

    src = str(tmp_path / "src")
    os.makedirs(src)

    def drop(df, i):
        staging = str(tmp_path / f"s{i}")
        df.coalesce(1).write.parquet(staging)
        (pq,) = [f for f in os.listdir(staging) if f.endswith(".parquet")]
        os.rename(os.path.join(staging, pq), os.path.join(src, f"p{i}.parquet"))

    rows = raw.orderBy("ts", "event_id").collect()
    third = len(rows) // 3
    drop(spark.createDataFrame(rows[:third], raw.schema), 0)
    drop(spark.createDataFrame(rows[third : 2 * third], raw.schema), 1)
    drop(spark.createDataFrame(rows[2 * third :], raw.schema), 2)
    drop(sentinels.select(*raw.columns), 3)

    from pasardassist_spark.streaming import read_event_stream

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    out = match_pattern_stream(stream, _steps(), within_us=WITHIN_US)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_matches")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    emitted = spark.sql("SELECT * FROM cep_matches").collect()
    got = [tuple(r.match_ids) for r in emitted]
    assert len(got) == len(set(got))  # exactly-once: no duplicate emissions
    want = {
        tuple(r.match_ids)
        for r in match_pattern(
            ev.select(
                "user_id", "event_id", "event_type",
                F.unix_micros("ts").alias("us"),
            ),
            ["user_id"], ["us", "event_id"], _steps(),
            id_col="event_id", time_col="us", within=WITHIN_US,
        ).collect()
    }
    assert set(got) == want
    assert len(want) > 0


def test_late_event_breaks_pending_match(spark, tmp_path):
    """A late-but-admissible event that lands BETWEEN a pending pattern's
    rows must break contiguity — the emission discipline exists exactly so
    this cannot be emitted early and then be wrong."""
    B = 1_000_000_000_000_000  # keep well above the epoch-0 initial watermark
    MS = 1_000_000

    def ns(us):
        return us * 1000

    def drop(df, i, src, tmp):
        staging = str(tmp / f"l{i}")
        df.coalesce(1).write.parquet(staging)
        (pq,) = [f for f in os.listdir(staging) if f.endswith(".parquet")]
        os.rename(os.path.join(staging, pq), os.path.join(src, f"p{i}.parquet"))

    schema = "event_id long, ts long, user_id long, event_type string, value double, props string"
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 0: view at B, click at B+100s — a pending (view, click) match,
    # NOT emitted yet (watermark = B+100s - 1h is far below the click)
    b0 = [(1, ns(B), 7, "view", 0.0, "{}"), (2, ns(B + 100 * MS), 7, "click", 0.0, "{}")]
    # batch 1: LATE error event at B+50s — admissible (>= watermark),
    # lands between view and click: contiguity broken
    b1 = [(3, ns(B + 50 * MS), 7, "error", 0.0, "{}")]
    # batch 2: far-future flush seals everything
    b2 = [(9, ns(B + 10**12), 7, "flush", 0.0, "{}")]
    for i, b in enumerate([b0, b1, b2]):
        drop(spark.createDataFrame(b, schema), i, src, tmp_path)

    from pasardassist_spark.streaming import read_event_stream

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    out = match_pattern_stream(stream, _steps())
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_late")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT * FROM cep_late").count() == 0


def test_null_predicate_is_nonmatch_not_crash(spark, tmp_path):
    """A step predicate evaluating to NULL (eq against a NULL column) must
    behave as a NON-match — the batch twin's where() semantics — not
    poison the bitmask and crash the fold's int() conversion."""
    B = 1_000_000_000_000_000
    MS = 1_000_000

    def ns(us):
        return us * 1000

    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        (1, ns(B), 7, "view", 0.0, "{}"),
        (2, ns(B + 10 * MS), 7, None, 0.0, "{}"),  # NULL event_type
        (3, ns(B + 20 * MS), 7, "view", 0.0, "{}"),
        (4, ns(B + 30 * MS), 7, "click", 0.0, "{}"),
        # flush sentinel far in the future seals everything
        (9, ns(B + 10 * 86400 * MS), 7, "flush", 0.0, "{}"),
    ]
    staging = str(tmp_path / "s0")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staging)
    (pq,) = [f for f in os.listdir(staging) if f.endswith(".parquet")]
    os.rename(os.path.join(staging, pq), os.path.join(src, "p0.parquet"))

    from pasardassist_spark.streaming import read_event_stream

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    out = match_pattern_stream(stream, _steps(), within_us=WITHIN_US)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_null_pred")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = [tuple(r.match_ids) for r in spark.sql(
        "SELECT * FROM cep_null_pred"
    ).collect()]
    # (1, NULL-row) is not a match; (3, 4) is the only (view, click) pair
    assert got == [(3, 4)], got
