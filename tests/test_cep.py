"""CEP pattern matching: differential vs a sequential Python reference on
the real event log (every contiguous view->click->purchase run within the
budget), plus the overlap and boundary semantics on a hand fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasardassist_spark.operators.cep import match_pattern
from pasardassist_spark.tables import load


def test_fixture_overlaps_and_budget(spark):
    rows = [
        # user 1: A A B -> two AB? pattern [A, B] matches at idx1 (A,B);
        # idx0 (A,A) fails step 2. Pattern [A, A] matches at idx0 only.
        (1, 1, "A", 100),
        (1, 2, "A", 200),
        (1, 3, "B", 250),
        # user 2: A B across a big gap -> killed by within
        (2, 4, "A", 100),
        (2, 5, "B", 5000),
    ]
    df = spark.createDataFrame(rows, "u long, id long, ev string, t long")
    ab = match_pattern(
        df, ["u"], ["t", "id"],
        [F.col("ev") == "A", F.col("ev") == "B"],
        id_col="id", time_col="t", within=1000,
    ).collect()
    assert [(r.u, list(r.match_ids), r.start_t, r.end_t) for r in ab] == [
        (1, [2, 3], 200, 250)
    ]
    aa = match_pattern(
        df, ["u"], ["t", "id"],
        [F.col("ev") == "A", F.col("ev") == "A"],
        id_col="id",
    ).collect()
    assert [list(r.match_ids) for r in aa] == [[1, 2]]
    # single-step pattern: every matching row, time cols degenerate
    a1 = match_pattern(
        df, ["u"], ["t", "id"], [F.col("ev") == "A"],
        id_col="id", time_col="t",
    ).collect()
    assert sorted(r.match_ids[0] for r in a1) == [1, 2, 4]
    assert all(r.start_t == r.end_t for r in a1)


def test_real_log_matches_sequential_reference(spark, sf_dir):
    WITHIN_US = 3_600_000_000  # 1 h
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    by_user: dict = {}
    for r in ev.collect():
        by_user.setdefault(r.user_id, []).append((r.us, r.event_id, r.event_type))
    for pattern, must_match in [
        (["view", "click"], True),  # 2-step: guaranteed present at sf0.001
        (["view", "click", "purchase"], False),  # 3-step: may be empty
    ]:
        k = len(pattern)
        got = {
            tuple(r.match_ids)
            for r in match_pattern(
                ev, ["user_id"], ["us", "event_id"],
                [F.col("event_type") == p for p in pattern],
                id_col="event_id", time_col="us", within=WITHIN_US,
            ).collect()
        }
        # sequential reference: scan every length-k window per sorted user
        want = set()
        for seq in by_user.values():
            seq.sort()
            for i in range(len(seq) - k + 1):
                w = seq[i : i + k]
                if [x[2] for x in w] == pattern and w[-1][0] - w[0][0] <= WITHIN_US:
                    want.add(tuple(x[1] for x in w))
        assert got == want, pattern
        if must_match:
            assert len(want) > 0
