"""LSM-shaped state merge (round-16): append-delta layers + amortized
compaction must be observationally equal to the eager per-batch merge,
while an append epoch writes only the batch (every prior file hard-links
forward) — the policy the BASELINE.md 100x twin showed the eager merge
needs for uniformly-spraying batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pasardassist_spark.operators.latest import latest_per_key
from pasardassist_spark.streaming.ingest import (
    append_into_bucketed_state,
    maintain_latest_state,
    read_lsm_state,
    read_state,
)
from pasardassist_spark.streaming.generations import committed_versions
from pasardassist_spark.tables import load

KEYS = ["user_id"]
COLS = ["event_id", "user_id", "event_type", "value", "ts"]


def _fold(df):
    # order columns built lazily: F.desc needs an active session
    return latest_per_key(df, KEYS, [F.desc("ts"), F.desc("event_id")])


def _batches(spark, sf_dir, n=5):
    ev = load(spark, sf_dir, "events").select(*COLS)
    return ev, [ev.filter(F.pmod(F.col("event_id"), F.lit(n)) == i) for i in range(n)]


def test_lsm_replay_equals_batch_with_compaction(spark, sf_dir, tmp_path):
    """5 appends at compact_every=3 (so the run crosses a compaction
    epoch) must fold to exactly the batch latest-per-key answer."""
    ev, batches = _batches(spark, sf_dir)
    state = str(tmp_path / "state")
    for i, b in enumerate(batches):
        append_into_bucketed_state(
            _fold(b), state, KEYS, _fold, epoch_id=i, compact_every=3
        )
    got = sorted(map(str, read_lsm_state(spark, state, _fold).select(*COLS).collect()))
    want = sorted(map(str, _fold(ev).select(*COLS).collect()))
    assert got == want


def test_lsm_append_epoch_links_prior_files(spark, sf_dir, tmp_path):
    """A non-compaction append must hard-link every prior data file
    forward (same inode) and add only the batch's delta files."""
    ev, batches = _batches(spark, sf_dir)
    state = str(tmp_path / "state")
    # high compact_every so both epochs are append-shaped
    append_into_bucketed_state(_fold(batches[0]), state, KEYS, _fold, compact_every=100)
    gen1 = os.path.join(state, committed_versions(state)[-1])
    inodes1 = {
        f: os.stat(os.path.join(r, f)).st_ino
        for r, _, fs in os.walk(gen1)
        for f in fs
        if f.endswith(".parquet")
    }
    append_into_bucketed_state(_fold(batches[1]), state, KEYS, _fold, compact_every=100)
    gen2 = os.path.join(state, committed_versions(state)[-1])
    inodes2 = {
        f: os.stat(os.path.join(r, f)).st_ino
        for r, _, fs in os.walk(gen2)
        for f in fs
        if f.endswith(".parquet")
    }
    assert gen2 != gen1
    missing = {f for f in inodes1 if f not in inodes2}
    relinked = {f for f in inodes1 if f in inodes2 and inodes1[f] != inodes2[f]}
    assert not missing and not relinked, (missing, relinked)
    assert len(inodes2) > len(inodes1)  # delta layer added, nothing rewritten


def test_lsm_compaction_resets_layers_and_shrinks_files(spark, sf_dir, tmp_path):
    """The compaction epoch folds layers down: afterwards the generation
    holds at most one file per (bucket, shuffle task) and the layer
    marker resets, so read amplification is bounded by compact_every."""
    from pasardassist_spark.streaming.ingest import _lsm_layers

    _, batches = _batches(spark, sf_dir)
    state = str(tmp_path / "state")
    # write 1 compacts (first generation), writes 2-3 append -> layers 2
    for b in batches[:3]:
        append_into_bucketed_state(_fold(b), state, KEYS, _fold, compact_every=3)
    pre = os.path.join(state, committed_versions(state)[-1])
    assert _lsm_layers(pre) == 2
    n_pre = sum(f.endswith(".parquet") for _, _, fs in os.walk(pre) for f in fs)
    # write 4: layers+1 reaches compact_every -> compaction epoch
    append_into_bucketed_state(_fold(batches[3]), state, KEYS, _fold, compact_every=3)
    post = os.path.join(state, committed_versions(state)[-1])
    assert _lsm_layers(post) == 0
    n_post = sum(f.endswith(".parquet") for _, _, fs in os.walk(post) for f in fs)
    assert n_post <= n_pre  # folded, not accreted


def test_lsm_epoch_replay_is_noop(spark, sf_dir, tmp_path):
    _, batches = _batches(spark, sf_dir)
    state = str(tmp_path / "state")
    append_into_bucketed_state(_fold(batches[0]), state, KEYS, _fold, epoch_id=0)
    append_into_bucketed_state(_fold(batches[1]), state, KEYS, _fold, epoch_id=1)
    v = committed_versions(state)
    append_into_bucketed_state(_fold(batches[1]), state, KEYS, _fold, epoch_id=1)
    assert committed_versions(state) == v  # replayed epoch: no new generation
    # empty delta is a no-op too
    empty = _fold(batches[0]).limit(0)
    append_into_bucketed_state(empty, state, KEYS, _fold, epoch_id=2)
    assert committed_versions(state) == v


def test_lsm_backend_stream_equals_generations_backend(spark, sf_dir, tmp_path):
    """maintain_latest_state(backend='lsm') must land the same state as
    the eager generations backend over the same chunked stream."""
    ev = load(spark, sf_dir, "events").select(*COLS)
    raw = ev.withColumn("ts", F.expr("unix_micros(ts) * CAST(1000 AS BIGINT)"))
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(3):
        raw.filter(F.pmod(F.col("event_id"), F.lit(3)) == i).coalesce(1).write.parquet(
            str(tmp_path / f"c{i}")
        )
        (pq,) = [f for f in os.listdir(tmp_path / f"c{i}") if f.endswith(".parquet")]
        os.rename(os.path.join(tmp_path / f"c{i}", pq), os.path.join(src, f"p{i}.parquet"))

    from pasardassist_spark.streaming.ingest import read_event_stream

    results = {}
    for backend in ("generations", "lsm"):
        q = maintain_latest_state(
            read_event_stream(spark, src, max_files_per_trigger=1),
            str(tmp_path / f"state_{backend}"),
            str(tmp_path / f"ckpt_{backend}"),
            backend=backend,
        )
        q.processAllAvailable()
        q.stop()
        if backend == "lsm":
            df = read_lsm_state(spark, str(tmp_path / f"state_{backend}"), _fold)
        else:
            df = read_state(spark, str(tmp_path / f"state_{backend}"))
        results[backend] = sorted(map(str, df.select(*COLS).collect()))
    assert results["generations"] == results["lsm"]
