"""Custom blocklog DataSource: batch reads must plan one partition per
page and return exactly the store's events; the stream reader must do
catch-up + tail through engine-checkpointed offsets, exactly-once across
a query restart."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pasardassist_spark.sources.blocklog import (
    BlockLogDataSource,
    head_block,
    write_block_page,
)


def _events(lo, hi, etype="sale"):
    return [
        {
            "block_number": b,
            "log_index": i,
            "event_type": etype,
            "address": f"0x{b:04x}",
            "payload": {"v": b * 10 + i},
        }
        for b in range(lo, hi)
        for i in range(2)
    ]


def test_batch_read_pages_and_bounds(spark, tmp_path):
    store = str(tmp_path / "chain")
    write_block_page(store, 0, 40, _events(0, 40))
    write_block_page(store, 40, 100, _events(40, 100))
    assert head_block(store) == 100

    spark.dataSource.register(BlockLogDataSource)
    df = (
        spark.read.format("blocklog")
        .option("path", store)
        .option("step", 25)
        .load()
    )
    # 100 blocks / 25-block pages -> 4 planned partitions
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
    got = df.agg(
        F.min("block_number"), F.max("block_number"), F.count("*")
    ).first()
    assert tuple(got) == (0, 99, 200)

    window = (
        spark.read.format("blocklog")
        .option("path", store)
        .option("step", 25)
        .option("fromBlock", 30)
        .option("toBlock", 60)
        .load()
    )
    assert window.count() == 60
    assert window.agg(F.min("block_number"), F.max("block_number")).first() == (
        30,
        59,
    )
    # payload survives as canonical JSON
    row = window.filter(
        (F.col("block_number") == 30) & (F.col("log_index") == 1)
    ).first()
    assert row.payload == '{"v": 301}'


def test_stream_catchup_tail_and_restart(spark, tmp_path):
    store = str(tmp_path / "chain")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    write_block_page(store, 0, 50, _events(0, 50))

    spark.dataSource.register(BlockLogDataSource)

    def start():
        return (
            spark.readStream.format("blocklog")
            .option("path", store)
            .option("step", 20)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(sink).count() == 100  # catch-up: blocks 0-49

    # tail: new pages land while the query is DOWN; restart resumes from
    # the checkpointed offset — no loss, no re-read
    write_block_page(store, 50, 70, _events(50, 70, etype="bid"))
    q = start()
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(sink)
    assert out.count() == 140
    assert out.select("block_number").distinct().count() == 70
    per_block = (
        out.groupBy("block_number").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in per_block] == [2], "duplicate or lost rows"
    assert out.filter(F.col("event_type") == "bid").count() == 40


def test_stream_rate_cap_bounds_batches(spark, tmp_path):
    """maxBlocksPerTrigger must cap how far each micro-batch advances: a
    50-block catch-up at cap 10 takes >= 5 batches, none admitting more
    than 10 blocks, with nothing lost."""
    store = str(tmp_path / "chain")
    write_block_page(store, 0, 50, _events(0, 50))
    spark.dataSource.register(BlockLogDataSource)
    q = (
        spark.readStream.format("blocklog")
        .option("path", store)
        .option("step", 20)
        .option("maxBlocksPerTrigger", 10)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    q.stop()
    out = spark.read.parquet(str(tmp_path / "sink"))
    assert out.count() == 100
    assert out.select("block_number").distinct().count() == 50
    assert len(progress) >= 5, f"expected >=5 capped batches, got {len(progress)}"
    assert max(p["numInputRows"] for p in progress) <= 20  # 10 blocks x 2 events


def test_stream_restart_with_cap_no_duplicates(spark, tmp_path):
    """Restarting a capped stream must not regress the offset into
    re-reads: the fresh reader's cap anchor starts at fromBlock (below
    the checkpoint) and must climb back without duplicating or losing a
    single block — the exact scenario the anchor-resync exists for."""
    store = str(tmp_path / "chain")
    write_block_page(store, 0, 100, _events(0, 100))
    spark.dataSource.register(BlockLogDataSource)

    def start():
        return (
            spark.readStream.format("blocklog")
            .option("path", store)
            .option("step", 20)
            .option("maxBlocksPerTrigger", 10)
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(str(tmp_path / "sink")).count() == 200

    write_block_page(store, 100, 130, _events(100, 130, etype="bid"))
    q = start()
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(str(tmp_path / "sink"))
    assert out.count() == 260, "blocks lost or re-read after capped restart"
    per_block = (
        out.groupBy("block_number").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in per_block] == [2]
    assert out.select("block_number").distinct().count() == 130
