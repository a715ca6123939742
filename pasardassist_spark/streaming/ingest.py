"""Structured Streaming ingestion — the Spark rebuild of the reference's
"tasks" half (SURVEY.md §2.1, §2.9, §3.2).

Reference behavior being replaced:

- paged catch-up scan + live WebSocket tail per contract event type
  (tasks.service.ts:58-101) -> ONE streaming query per event log: a
  checkpointed ``readStream`` is both backfill and tail, exactly-once
  (ST1/S3), with ``maxFilesPerTrigger`` as the rate cap (S1).
- upsert sinks + Bull/Redis retry queue for out-of-order child events
  (db.service.ts:87-161, sub-tasks.service.ts:122-174) -> ``foreachBatch``
  latest-state MERGE: each micro-batch folds into the entity table keyed by
  the natural key; ordering is by event time not arrival, so out-of-order
  arrivals converge without a retry queue (S7/S9/ST4).

MERGE emulation without Delta: the silver table is written as versioned
generations (``v000001``, ...); each batch writes generation N+1 = merge of
generation N and the batch's latest rows. On a Delta/Iceberg-equipped
cluster the ``_merge_batch`` body becomes a single ``MERGE INTO`` — the
surrounding streaming topology is unchanged. Generations also give the
poor-man's time travel the reference lacks entirely.

Scale: state is hash-partitioned by the entity key at write, so the merge
join is co-partitioned; per-batch work is O(batch + touched-state) when the
state table is partitioned/bucketed by key (partition-overwrite instead of
full rewrite) — noted inline where local parquet differs from cluster Delta.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from pasardassist_spark.operators.latest import latest_per_key

# Raw parquet schema: ts arrives as long nanos (TIMESTAMP(NANOS) files read
# under spark.sql.legacy.parquet.nanosAsLong).
EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def read_event_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Checkpointable event-log stream (backfill + tail in one query)."""
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def _state_versions(state_dir: str) -> list[str]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(d for d in os.listdir(state_dir) if d.startswith("v"))


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Latest generation of the silver entity table, if any."""
    versions = _state_versions(state_dir)
    if not versions:
        return None
    return spark.read.parquet(os.path.join(state_dir, versions[-1]))


def maintain_latest_state(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str] = ("user_id",),
    order: Sequence[Column] | None = None,
    keep_generations: int = 2,
) -> StreamingQuery:
    """foreachBatch MERGE: entity state = latest event per key (ST4).

    Idempotent under replay: merging the same events twice is a no-op
    because the fold is an argmax by (event time, event id), mirroring the
    reference's idempotent upserts (ST2).
    """

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        ordering = order or [F.desc("ts"), F.desc("event_id")]
        batch_latest = latest_per_key(batch_df, list(keys), ordering)
        existing = read_state(spark, state_dir)
        merged = (
            batch_latest
            if existing is None
            else latest_per_key(
                existing.unionByName(batch_latest), list(keys), ordering
            )
        )
        # On Delta: MERGE INTO state USING batch_latest ON keys WHEN MATCHED
        # AND batch.ts > state.ts THEN UPDATE ... Here: versioned generation
        # swap (atomic via directory rename-on-commit semantics of the
        # parquet committer), repartitioned by key so the next merge join is
        # co-partitioned.
        versions = _state_versions(state_dir)
        next_v = f"v{(int(versions[-1][1:]) + 1) if versions else 1:06d}"
        merged.repartition(*keys).write.mode("overwrite").parquet(
            os.path.join(state_dir, next_v)
        )
        for stale in versions[:-keep_generations] if len(versions) >= keep_generations else []:
            _rmtree(os.path.join(state_dir, stale))

    return (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def _rmtree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def streaming_day_rollup(stream: DataFrame, watermark: str = "2 days") -> DataFrame:
    """ST3: tumbling-day rollup with late-data watermark — the streaming
    twin of queries/timeseries.time_day_rollup (equality tested in §5.2)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(F.col("w.start").alias("day"), "n_events", "total_value", "approx_users")
    )
