"""Dynamic source registration (SURVEY.md §2.1 S11).

Reference behavior being replaced: on a ``TokenRegistered`` event the
reference spawns a brand-new WebSocket listener for that ERC-721/1155
contract and backfills it from block 0 (tasks.service.ts:915-917,
sub-tasks.service.ts:203-217, restart-time re-subscribe
tasks.common.ts:223-231) — one listener per collection, processes and
sockets multiplying with the catalog.

Spark shape: ONE multiplexed streaming query over the shared event log,
filtered per micro-batch against a small ``collections`` control table that
is re-read every batch — registering a collection is a metadata append, not
a new query. The reference's "backfill from block 0" becomes a pending log:
events whose collection is not yet registered are parked, and every batch
re-admits parked events that now match the control table, so a registration
retroactively captures the collection's full history without restarting or
rewinding the stream.

The control table and pending log use the same committed-generation
discipline as the state store (ingest.py): a generation is visible only
after its commit marker lands, so a crash mid-write never truncates the
pending log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from pasardassist_spark.streaming.generations import (
    read_latest as _read_generation,
    write_generation as _write_generation,
)


def register_collection(spark: SparkSession, control_dir: str, collection: str) -> None:
    """The ``TokenRegistered`` handler: append one row to the control table.
    Takes effect at the NEXT micro-batch — no query restart, no new stream."""
    existing = _read_generation(spark, control_dir)
    row = spark.createDataFrame([(collection,)], "collection string")
    merged = row if existing is None else existing.unionByName(row).distinct()
    _write_generation(merged, control_dir)


def registered_collections(spark: SparkSession, control_dir: str) -> DataFrame | None:
    return _read_generation(spark, control_dir)


def dynamic_collection_sink(
    stream: DataFrame,
    control_dir: str,
    out_dir: str,
    pending_dir: str,
    checkpoint_dir: str,
    collection_col: str = "event_type",
) -> StreamingQuery:
    """Multiplexed ingest: per batch, admit (batch ∪ pending) events whose
    collection is registered; park the rest. The control table is broadcast
    (O(collections) rows) — the filter is a broadcast semi-join, never a
    shuffle of the event stream."""

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        ctrl = _read_generation(spark, control_dir)
        pending = _read_generation(spark, pending_dir)
        candidates = (
            batch_df if pending is None else batch_df.unionByName(pending)
        )
        if ctrl is None:
            parked = candidates
        else:
            key = ctrl.withColumnRenamed("collection", collection_col)
            admitted = candidates.join(F.broadcast(key), collection_col, "semi")
            parked = candidates.join(F.broadcast(key), collection_col, "anti")
            # Append sink: on Delta this is a transactional append; plain
            # parquet append is at-least-once under task retry (noted, fine
            # for the bronze log whose consumers dedup by event_id).
            admitted.write.mode("append").parquet(out_dir)
        _write_generation(parked, pending_dir)

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
