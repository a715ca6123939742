"""Streaming drift monitor: the incrementally-maintained KS readout must
equal the batch stat_ks_test after replaying the 'click' sample in
micro-batches against the frozen 'view' reference distribution."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pasardassist_spark.tables import load


def test_streaming_drift_equals_batch_ks(spark, sf_dir, tmp_path):
    from pasardassist_spark.queries.matching import (
        KS_SAMPLE_A,
        KS_SAMPLE_B,
        stat_ks_test,
    )
    from pasardassist_spark.streaming.drift import (
        drift_from_state,
        maintain_value_distribution,
    )

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == KS_SAMPLE_A).select("value")
    rows = clicks.collect()

    # replay the live sample in 3 micro-batches so at least two merges fold
    # into existing state (the incremental path, not just the first write)
    src = str(tmp_path / "chunks")
    os.makedirs(src)
    chunk = len(rows) // 3 + 1
    idx = 0
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            stage = tmp_path / f"stage{i}"
            spark.createDataFrame(part, clicks.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(stage))
            for f in os.listdir(stage):
                if f.endswith(".parquet"):
                    os.rename(
                        str(stage / f), os.path.join(src, f"part{idx}.parquet")
                    )
                    idx += 1
    assert idx == 3

    stream = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_value_distribution(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    from pasardassist_spark.streaming.generations import committed_versions

    assert len(committed_versions(str(tmp_path / "state"))) >= 2

    reference = (
        ev.filter(F.col("event_type") == KS_SAMPLE_B)
        .groupBy("value")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    got = drift_from_state(spark, str(tmp_path / "state"), reference).collect()
    want = stat_ks_test(spark, sf_dir).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()
