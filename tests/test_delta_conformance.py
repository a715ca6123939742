"""Delta MERGE semantics conformance (VERDICT r6 #7 / r7 #5).

delta-spark cannot run in this container (no package index; re-verified
this round), so the upsert contract is pinned the other way around:
``merge_latest_apply`` expands the EXACT whenMatched/_lex_greater condition
``merge_latest_into_delta`` hands the Delta builder, and these tests prove
that executor equivalent — batch-by-batch, on Delta-shaped vectors with
out-of-order arrivals, partial/full ordering ties, replays, and mixed
insert+update batches — to (a) the generational parquet backend the
container actually runs and (b) the global argmax ground truth. When
delta-spark IS present (a real cluster), test_delta_roundtrip in
test_streaming.py runs the genuine MERGE INTO against the same vectors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pasardassist_spark.operators.latest import latest_per_key
from pasardassist_spark.streaming.delta_sink import (
    _lex_greater,
    merge_latest_apply,
)

SCHEMA = "k long, ts long, event_id long, payload string"

# Delta-shaped vectors: each inner list is one micro-batch (already in
# arrival order). Edge cases: key 1 arrives out of order (late lower
# tuple must NOT update), key 2 ties on ts (event_id decides), key 3 is
# insert-then-update-then-exact-replay, key 4 is a pure insert in the
# last batch (mixed insert+update batch), batch 4 replays batch 2's rows
# verbatim (idempotency).
BATCHES = [
    [(1, 100, 7, "a1"), (2, 50, 3, "b1"), (3, 10, 1, "c1")],
    [(1, 90, 9, "a-late"), (2, 50, 5, "b2"), (3, 20, 2, "c2")],
    [(3, 20, 2, "c2"), (4, 5, 1, "d1"), (1, 100, 8, "a2")],
    [(1, 90, 9, "a-late"), (2, 50, 5, "b2"), (3, 20, 2, "c2")],
]

EXPECT = {
    # key -> (ts, event_id, payload): argmax by (ts, event_id)
    1: (100, 8, "a2"),
    2: (50, 5, "b2"),
    3: (20, 2, "c2"),
    4: (5, 1, "d1"),
}


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _as_map(rows):
    return {r.k: (r.ts, r.event_id, r.payload) for r in rows}


def test_lex_greater_truth_table(spark):
    """The MERGE condition string itself: strict tuple-lexicographic >."""
    cases = [
        ((2, 1), (1, 9), True),   # first col decides
        ((1, 9), (2, 1), False),
        ((1, 5), (1, 4), True),   # tie on first, second decides
        ((1, 4), (1, 5), False),
        ((1, 5), (1, 5), False),  # full tie: NOT greater (no update)
    ]
    rows = [(sa, sb, ta, tb) for (sa, sb), (ta, tb), _ in cases]
    df = (
        spark.createDataFrame(rows, "sa long, sb long, ta long, tb long")
        .select(
            F.expr(
                _lex_greater("s", "t", ["a", "b"])
                .replace("s.a", "sa").replace("s.b", "sb")
                .replace("t.a", "ta").replace("t.b", "tb")
            ).alias("gt")
        )
        .collect()
    )
    assert [r.gt for r in df] == [c[2] for c in cases]


def test_merge_apply_matches_global_argmax(spark):
    """Folding the batches through the MERGE executor reproduces the
    latest-per-key argmax over the full concatenated history."""
    state = None
    for batch in BATCHES:
        delta = latest_per_key(
            _mk(spark, batch), ["k"], [F.desc("ts"), F.desc("event_id")]
        )
        if state is None:
            state = delta  # isDeltaTable=False branch: first write
        else:
            state = merge_latest_apply(state, delta, ["k"])
        state = spark.createDataFrame(state.collect(), SCHEMA)  # materialize
    assert _as_map(state.collect()) == EXPECT

    everything = _mk(spark, [r for b in BATCHES for r in b])
    truth = latest_per_key(everything, ["k"], [F.desc("ts"), F.desc("event_id")])
    assert _as_map(truth.collect()) == EXPECT


def test_merge_apply_matches_generational_backend(spark, tmp_path):
    """The two S7 implementations agree row-for-row after every batch:
    the Delta MERGE expansion and the generational parquet store are the
    same upsert contract on different containers."""
    from pasardassist_spark.streaming.ingest import (
        merge_into_bucketed_state,
        read_state,
    )

    ordering = [F.desc("ts"), F.desc("event_id")]

    def combine(prev, delta):
        return latest_per_key(
            prev.drop("bucket").unionByName(delta.drop("bucket")), ["k"], ordering
        )

    state_dir = str(tmp_path / "state")
    merged = None
    for batch in BATCHES:
        delta = latest_per_key(_mk(spark, batch), ["k"], ordering)
        merge_into_bucketed_state(delta, state_dir, ("k",), combine)
        if merged is None:
            merged = delta
        else:
            merged = merge_latest_apply(merged, delta, ["k"])
        merged = spark.createDataFrame(merged.collect(), SCHEMA)
        gen = read_state(spark, state_dir).select("k", "ts", "event_id", "payload")
        assert _as_map(gen.collect()) == _as_map(merged.collect())


def test_merge_apply_replay_is_noop(spark):
    """Re-merging an already-committed batch changes nothing — the
    idempotency the reference's natural-key upserts rely on
    (db.service.ts:154-160): a full ordering-tuple tie does not update."""
    base = latest_per_key(
        _mk(spark, BATCHES[0] + BATCHES[1]),
        ["k"],
        [F.desc("ts"), F.desc("event_id")],
    )
    state = spark.createDataFrame(base.collect(), SCHEMA)
    for replay in BATCHES[:2]:
        delta = latest_per_key(
            _mk(spark, replay), ["k"], [F.desc("ts"), F.desc("event_id")]
        )
        after = merge_latest_apply(state, delta, ["k"])
        assert sorted(map(tuple, after.collect())) == sorted(
            map(tuple, state.collect())
        )


def test_merge_apply_tie_keeps_target_payload(spark):
    """Equal ordering tuple, different payload: the incumbent row wins
    (whenMatched condition is strict >) — divergent-payload replays
    cannot flap the stored value."""
    tgt = _mk(spark, [(1, 100, 7, "committed")])
    src = _mk(spark, [(1, 100, 7, "divergent-replay")])
    out = merge_latest_apply(tgt, src, ["k"]).collect()
    assert _as_map(out) == {1: (100, 7, "committed")}
