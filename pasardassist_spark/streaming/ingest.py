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
generations (``v000001``, ...), each hash-bucketed by the entity key
(``bucket=NN`` partition dirs). A batch only MERGES the buckets its keys
touch: generation N+1 = rewrite(touched buckets) + hard-link(untouched
buckets from generation N). Per-batch I/O is therefore
O(batch + touched-state), not O(state) — the property a 100 TB silver table
needs. On a Delta/Iceberg-equipped cluster the ``_merge_batch`` body
becomes a single ``MERGE INTO``; the surrounding streaming topology is
unchanged. Generations also give the poor-man's time travel the reference
lacks entirely.

Scale rule for the bucket count (measured, BASELINE.md round-16 100x twin):
bucket count bounds per-batch I/O only when a batch's keys are
CONCENTRATED relative to the key space (time-correlated arrivals,
key-range bucketing). A batch whose keys hash-spray across every bucket
touches the whole store regardless of bucket count — and raising the
count then only adds per-file/task overhead (16 -> 256 buckets made the
100x fixed-probe batch 1.5x SLOWER). For uniformly-spraying workloads the
next decade is an LSM-shaped merge policy on this same layout: append
per-bucket DELTA files each batch (O(batch) per batch) and fold them into
the base on an amortized compaction cadence.

Crash safety: a generation only counts once its ``_COMMITTED`` marker
exists, written after both the Spark write and the hard-links complete into
a STAGING dir that is then os.rename()d into its version slot — a crash
mid-write leaves an ignored staging directory, never a truncated "latest"
state (Spark's own ``_SUCCESS`` is insufficient because the links land
after the job commit), and the rename CAS means no writer — stream or
compactor — can ever overwrite a committed generation.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from pasardassist_spark.operators.latest import latest_per_key
from pasardassist_spark.streaming.generations import (
    apply_retention,
    commit,
    committed_versions as _state_versions,
    link_tree as _link_tree,
    next_version_dir,
    publish_staged,
)

def read_event_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Checkpointable event-log stream (backfill + tail in one query).

    The stream schema is derived from the files themselves (a batch-side
    footer read is allowed before the stream starts) rather than hard-coded:
    different testdata generations encode ``ts`` as TIMESTAMP(NANOS)-as-long
    or as plain timestamp[us], and a hard-coded ``ts long`` schema against
    micros data *runs* but collapses every event time to ~1970 — a silent
    unit error. ``_normalize_event_time`` applies the identical conditional
    conversion the batch scan uses, so replay-equals-batch holds by
    construction.
    """
    from pasardassist_spark.tables import _normalize_event_time

    # Same TIMESTAMP(NANOS) quirk as the batch scan (tables.load): set it
    # here too so a stream can be the session's FIRST events read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    return _normalize_event_time(raw)


N_STATE_BUCKETS = 16  # key-hash buckets; at 100 TB this becomes O(1000s)


def read_state(
    spark: SparkSession, state_dir: str, version: int | str | None = None
) -> DataFrame | None:
    """Committed generation of the silver entity table, if any — the
    latest by default, or a specific retained one via ``version`` (an int
    like 3 or a slot name like "v000003") — Delta-style time travel on
    the generational store, bounded by ``keep_generations`` retention.
    Asking for a version outside the retained window raises (listing the
    retained slots) rather than silently serving a different snapshot.
    The internal ``bucket`` partition column is dropped from the view."""
    versions = _state_versions(state_dir)
    if not versions:
        return None
    if version is None:
        pick = versions[-1]
    else:
        pick = version if isinstance(version, str) else f"v{version:06d}"
        if pick not in versions:
            raise ValueError(
                f"version {pick!r} is not a committed retained generation "
                f"of {state_dir}; retained: {versions}"
            )
    df = spark.read.parquet(os.path.join(state_dir, pick))
    return df.drop("bucket") if "bucket" in df.columns else df


def _bucket_of(keys: Sequence[str]) -> Column:
    return F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(N_STATE_BUCKETS))


EPOCH_MARKER = "_EPOCH"  # underscore prefix: invisible to parquet readers


def _applied_epoch(gen_dir: str) -> int | None:
    p = os.path.join(gen_dir, EPOCH_MARKER)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(fh.read().strip())


def merge_into_bucketed_state(
    batch_state: DataFrame,
    state_dir: str,
    keys: Sequence[str],
    combine,
    keep_generations: int = 2,
    epoch_id: int | None = None,
) -> None:
    """The generic incremental MERGE: fold a per-batch state delta into the
    bucketed, generational state table.

    ``combine(prev_touched, delta)`` must be an ASSOCIATIVE merge of two
    state frames (same schema) — argmax for latest-wins fields, sum for
    counters, min/max for extrema — so replay order cannot change the fix
    point. Only buckets named by the delta are re-merged and rewritten;
    untouched buckets hard-link from the previous generation
    (O(batch + touched-state) I/O per batch). On Delta the body becomes a
    single MERGE INTO.

    Publication is atomic: the generation is fully staged — Spark write,
    hard-links, AND commit marker — in a temp dir, then os.rename()d into
    its version slot (same CAS as compact_state). If a concurrent
    compaction took the slot first, the rename fails and the merge retries
    with the next slot; compaction preserves logical state, so the staged
    content stays correct. A committed generation is therefore never
    overwritten by anyone.

    ``epoch_id`` (opt-in) makes NON-idempotent combines (sums, counters)
    exactly-once under foreachBatch retries: each generation records the
    epoch that produced it, and a replay whose epoch is <= the recorded
    one is a no-op. Argmax-style combines don't need it (replay is a
    natural no-op); sum-style combines DO — a crash between the state
    commit and the stream's checkpoint commit otherwise double-merges the
    batch on restart. Compaction carries the marker forward.
    """
    spark = batch_state.sparkSession
    versions_pre = _state_versions(state_dir)
    if epoch_id is not None and versions_pre:
        applied = _applied_epoch(os.path.join(state_dir, versions_pre[-1]))
        if applied is not None and applied >= epoch_id:
            return  # replay of an already-merged epoch
    delta = batch_state.withColumn("bucket", _bucket_of(keys))
    # Driver-side METADATA collect: at most N_STATE_BUCKETS small ints
    # (which partitions to merge), never data rows.
    touched = sorted(r["bucket"] for r in delta.select("bucket").distinct().collect())
    if not touched:
        # an EMPTY delta must be a no-op, not an empty generation: a
        # zero-row partitionBy write stages no parquet footers, and the
        # next read_state of that committed slot dies with
        # UNABLE_TO_INFER_SCHEMA. A batch of pure rejects (every doc
        # dead-lettered or gate-failed — e.g. a spam-only crawl window)
        # is a legitimate epoch, found by the round-13 10x docgate
        # replica whose token prefixing starved the Gopher gate.
        return
    versions = _state_versions(state_dir)
    prev_dir = os.path.join(state_dir, versions[-1]) if versions else None
    if prev_dir is None:
        merged = delta
    else:
        prev = spark.read.parquet(prev_dir)
        prev_touched = prev.filter(F.col("bucket").isin(touched))
        merged = combine(prev_touched, delta).withColumn("bucket", _bucket_of(keys))
    # Stage generation N+1 (repartitioned by key so the merge join and the
    # next read are co-partitioned), link untouched buckets, mark committed,
    # then atomically publish into the next free version slot.
    os.makedirs(state_dir, exist_ok=True)
    tmp_dir = os.path.join(state_dir, f".merge-{os.getpid()}")
    merged.repartition(*keys).write.partitionBy("bucket").mode("overwrite").parquet(
        tmp_dir
    )
    if prev_dir is not None:
        touched_set = {f"bucket={b}" for b in touched}
        for d in os.listdir(prev_dir):
            if d.startswith("bucket=") and d not in touched_set:
                _link_tree(os.path.join(prev_dir, d), os.path.join(tmp_dir, d))
    if epoch_id is not None:
        with open(os.path.join(tmp_dir, EPOCH_MARKER), "w") as fh:
            fh.write(str(epoch_id))
    commit(tmp_dir)  # marker rides inside the rename: publish is atomic
    publish_staged(tmp_dir, state_dir)
    apply_retention(state_dir, _state_versions(state_dir)[:-1], keep_generations)


LSM_LAYERS_MARKER = "_LSM_LAYERS"  # delta layers since the last compaction


def _lsm_layers(gen_dir: str) -> int:
    p = os.path.join(gen_dir, LSM_LAYERS_MARKER)
    if not os.path.exists(p):
        return 0
    with open(p) as fh:
        return int(fh.read().strip())


def append_into_bucketed_state(
    batch_state: DataFrame,
    state_dir: str,
    keys: Sequence[str],
    fold,
    keep_generations: int = 2,
    epoch_id: int | None = None,
    compact_every: int = 8,
) -> None:
    """LSM-shaped MERGE for uniformly-spraying batches (the BASELINE.md
    round-16 100x finding): when a batch's keys hash-spray across every
    bucket, the eager merge (merge_into_bucketed_state) rereads and
    rewrites the WHOLE store each batch — touched-state is all state. This
    policy instead APPENDS the batch as a delta layer (one file per
    touched bucket, O(batch) write; every prior file hard-links forward,
    O(1) I/O each) and folds the layers down only on an amortized
    compaction cadence (every ``compact_every``-th append rewrites the
    store folded — O(state)/compact_every amortized per batch).

    ``fold(df) -> df`` must be an IDEMPOTENT, order-insensitive reduction
    of a state-schema frame to its fix point (latest_per_key,
    dropDuplicates, a groupBy re-aggregation) — the unary form of the
    eager path's binary ``combine`` (combine(a, b) == fold(a UNION b)), so
    the two policies are interchangeable per table. Readers of an LSM
    table MUST read through :func:`read_lsm_state`, which applies the same
    fold over base+layers; read cost grows with layer count, which
    ``compact_every`` bounds.

    Same atomicity (full staging + commit marker + CAS rename), epoch
    replay guard, retention, and empty-delta no-op as the eager merge.
    """
    spark = batch_state.sparkSession
    versions = _state_versions(state_dir)
    if epoch_id is not None and versions:
        applied = _applied_epoch(os.path.join(state_dir, versions[-1]))
        if applied is not None and applied >= epoch_id:
            return  # replay of an already-applied epoch
    delta = batch_state.withColumn("bucket", _bucket_of(keys))
    if delta.select("bucket").limit(1).count() == 0:
        return  # empty delta: no-op, never an empty generation
    prev_dir = os.path.join(state_dir, versions[-1]) if versions else None
    layers = _lsm_layers(prev_dir) if prev_dir else 0
    compacting = prev_dir is not None and layers + 1 >= compact_every
    os.makedirs(state_dir, exist_ok=True)
    tmp_dir = os.path.join(state_dir, f".lsm-{os.getpid()}")
    if prev_dir is None or compacting:
        # compaction epoch (or first write): fold base + layers + delta to
        # the fix point and rewrite — the amortized O(state) pass
        frames = delta.drop("bucket")
        if prev_dir is not None:
            frames = frames.unionByName(
                spark.read.parquet(prev_dir).drop("bucket")
            )
        merged = fold(frames).withColumn("bucket", _bucket_of(keys))
        merged.repartition(*keys).write.partitionBy("bucket").mode(
            "overwrite"
        ).parquet(tmp_dir)
        new_layers = 0
    else:
        # append epoch: one delta file per touched bucket (repartition by
        # the bucket column -> each bucket's rows land in ONE task), then
        # hard-link every prior file forward — O(batch + #files) total
        delta.repartition(F.col("bucket")).write.partitionBy("bucket").mode(
            "overwrite"
        ).parquet(tmp_dir)
        for d in os.listdir(prev_dir):
            if d.startswith("bucket="):
                _link_tree(os.path.join(prev_dir, d), os.path.join(tmp_dir, d))
        new_layers = layers + 1
    with open(os.path.join(tmp_dir, LSM_LAYERS_MARKER), "w") as fh:
        fh.write(str(new_layers))
    if epoch_id is not None:
        with open(os.path.join(tmp_dir, EPOCH_MARKER), "w") as fh:
            fh.write(str(epoch_id))
    commit(tmp_dir)
    publish_staged(tmp_dir, state_dir)
    apply_retention(state_dir, _state_versions(state_dir)[:-1], keep_generations)


def read_lsm_state(
    spark: SparkSession, state_dir: str, fold, version: int | str | None = None
):
    """Read an LSM state table folded to its fix point: the committed
    generation's base + unmerged delta layers, reduced by the table's
    ``fold`` (the same one its appends use). Returns None before the
    first generation, like read_state."""
    df = read_state(spark, state_dir, version)
    return None if df is None else fold(df)


def maintain_latest_state(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str] = ("user_id",),
    order: Sequence[Column] | None = None,
    keep_generations: int = 2,
    backend: str = "auto",
    order_cols: Sequence[str] = ("ts", "event_id"),
) -> StreamingQuery:
    """foreachBatch MERGE: entity state = latest event per key (ST4).

    Idempotent under replay: merging the same events twice is a no-op
    because the fold is an argmax by (event time, event id), mirroring the
    reference's idempotent upserts (ST2).

    Incremental: state is hash-bucketed by key; only buckets containing a
    batch key are re-merged and rewritten — untouched buckets are
    hard-linked from the previous generation, so per-batch I/O is
    O(batch + touched-state), not O(state).

    ``backend`` selects the sink: ``"generations"`` = the portable
    parquet generation store (eager per-batch merge); ``"lsm"`` = the
    same store under the append-delta policy
    (:func:`append_into_bucketed_state` — right when batch keys spray
    across all buckets; read the table back through
    :func:`read_lsm_state` with the matching latest_per_key fold);
    ``"delta"`` = a transactional Delta ``MERGE INTO``
    (streaming/delta_sink.py; requires delta-spark, raises otherwise);
    ``"auto"`` = delta when installed, else generations — the same code
    deploys on a Delta cluster and in this container. The delta path
    derives its MERGE condition from ``order_cols`` (the string-column
    form of the default ``order`` argmax); a custom ``order`` needs
    matching ``order_cols``.
    """
    if backend not in ("auto", "generations", "delta", "lsm"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend == "auto":
        from pasardassist_spark.streaming.delta_sink import delta_available

        backend = "delta" if delta_available() else "generations"

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        ordering = order or [F.desc(c) for c in order_cols]
        batch_latest = latest_per_key(batch_df, list(keys), ordering)

        if backend == "delta":
            from pasardassist_spark.streaming.delta_sink import (
                merge_latest_into_delta,
            )

            merge_latest_into_delta(batch_latest, state_dir, keys, order_cols)
            return

        if backend == "lsm":
            append_into_bucketed_state(
                batch_latest,
                state_dir,
                keys,
                lambda df: latest_per_key(df, list(keys), ordering),
                keep_generations,
            )
            return

        def combine(prev: DataFrame, delta: DataFrame) -> DataFrame:
            return latest_per_key(
                prev.drop("bucket").unionByName(delta.drop("bucket")),
                list(keys),
                ordering,
            )

        merge_into_bucketed_state(
            batch_latest, state_dir, keys, combine, keep_generations
        )

    return (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def maintain_entity_state(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keep_generations: int = 2,
) -> StreamingQuery:
    """ST4 as a true state MACHINE (not just row argmax): each micro-batch
    is folded by ``fold_entity_state`` (status argmax + additive counters +
    extrema — the reference's per-event $set/$inc mutations,
    tasks.service.ts:367-373,585-591) and merged associatively into the
    bucketed state table. fold ⊕ merge associativity makes replay and
    out-of-order arrival converge to the batch fix point."""
    from pasardassist_spark.operators.fold import (
        fold_entity_state,
        merge_entity_states,
    )

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        delta = fold_entity_state(batch_df)

        def combine(prev: DataFrame, d: DataFrame) -> DataFrame:
            return merge_entity_states(prev.drop("bucket"), d.drop("bucket"))

        merge_into_bucketed_state(
            delta, state_dir, ("user_id",), combine, keep_generations
        )

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def streaming_day_rollup(stream: DataFrame, watermark: str = "2 days") -> DataFrame:
    """ST3: tumbling-day rollup with late-data watermark — the streaming
    twin of queries/timeseries.day_rollup_batch (equality tested in §5.2)."""
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


def compact_state(
    spark: SparkSession,
    state_dir: str,
    files_per_bucket: int = 1,
    keep_generations: int = 2,
) -> bool:
    """Maintenance: rewrite the latest generation with coalesced files.

    The incremental merge writes up to shuffle-partitions files per touched
    bucket per batch; after many micro-batches a bucket accumulates small
    files (the classic streaming small-files problem — at 100 TB this is
    what slowly kills scan throughput and NameNode/listing latency). This
    job reads the latest committed generation and writes a new generation
    with up to ``files_per_bucket`` files per bucket (a salt spreads each
    bucket over that many write tasks, so a hot bucket keeps write and scan
    parallelism). Run it on a cadence, like a Delta OPTIMIZE.

    Concurrency: the new generation is staged in a temp dir and RENAMED
    into its version slot — if a concurrent micro-batch committed that
    version first, the rename fails and compaction ABORTS cleanly (returns
    False; retry next cadence). It never overwrites another writer's
    commit. ``keep_generations`` must match the stream's setting: retention
    here must not delete history the pipeline is keeping for time travel —
    and must leave enough generations that the concurrent stream's read of
    the pre-compaction generation cannot be reaped mid-job.
    """
    versions = _state_versions(state_dir)
    if not versions:
        return True
    cur_dir = os.path.join(state_dir, versions[-1])
    cur = spark.read.parquet(cur_dir)
    # bucket count from the directory listing — no table scan
    n_buckets = sum(1 for d in os.listdir(cur_dir) if d.startswith("bucket="))
    if n_buckets == 0:
        return True
    next_dir = next_version_dir(state_dir, versions)
    tmp_dir = f"{next_dir}.compact-{os.getpid()}"
    salt = F.pmod(F.hash(*[c for c in cur.columns if c != "bucket"]), F.lit(files_per_bucket))
    (
        cur.repartition(
            max(1, n_buckets * files_per_bucket), F.col("bucket"), salt
        )
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(tmp_dir)
    )
    # carry the epoch marker forward: compaction preserves logical state,
    # including which epoch last merged (else a post-compaction replay of
    # that epoch would double-merge)
    applied = _applied_epoch(cur_dir)
    if applied is not None:
        with open(os.path.join(tmp_dir, EPOCH_MARKER), "w") as fh:
            fh.write(str(applied))
    commit(tmp_dir)  # marker rides inside the rename: publish is atomic,
    # so a concurrent reader can never observe the slot in an
    # exists-but-uncommitted state
    try:
        os.rename(tmp_dir, next_dir)  # CAS: fails if the slot was taken
    except OSError:
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        return False
    apply_retention(state_dir, versions, keep_generations)
    return True
