"""Semantic invariants for the data-mining query family (queries/mining.py
+ operators/skyline.py); oracle value-parity is covered by
tests/test_oracle_parity.py and the driver gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasardassist_spark.operators.skyline import skyline
from pasardassist_spark.queries import mining
from pasardassist_spark.tables import load


def test_global_skyline_matches_bruteforce(spark):
    rows = [
        # (x=cost, y=quality) — includes duplicates, co-skyline ties, and
        # a dominated tie-on-one-dim case.
        (1.0, 5), (1.0, 5), (1.0, 3), (2.0, 7), (2.0, 7), (3.0, 7),
        (0.5, 1), (4.0, 9), (4.0, 2), (5.0, 9),
    ]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(rows)], "id long, x double, y int"
    )
    got = {r.id for r in skyline(df, "x", "y").collect()}
    want = set()
    for i, (px, py) in enumerate(rows):
        dominated = any(
            qx <= px and qy >= py and (qx < px or qy > py)
            for j, (qx, qy) in enumerate(rows)
            if j != i
        )
        if not dominated:
            want.add(i)
    assert got == want


def test_skyline_excludes_null_criteria(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 5), (1, None, 9), (2, 2.0, None)],
        "id long, x double, y int",
    )
    assert {r.id for r in skyline(df, "x", "y").collect()} == {0}


def test_skyline_local_prefilter_is_partition_invariant(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    a = {
        r.p_partkey
        for r in skyline(part, "p_retailprice", "p_size").collect()
    }
    b = {
        r.p_partkey
        for r in skyline(
            part.repartition(37), "p_retailprice", "p_size"
        ).collect()
    }
    assert a == b and a


def test_pagerank_conserves_mass_and_is_positive(spark, sf_dir):
    out = mining.graph_pagerank(spark, sf_dir).collect()
    total = sum(r.rank for r in out)
    # bidirectional edges -> no dangling mass: ranks sum to 1
    assert abs(total - 1.0) < 1e-3, total
    assert all(r.rank > 0 for r in out)
    assert len(out) == len({r.node for r in out})


def test_mb_apriori_gate_loses_no_pairs(spark, sf_dir):
    """The frequent-item pre-filter must equal the unpruned pair count."""
    li = load(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    unpruned = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= mining.MB_MIN_PAIR)
        .count()
    )
    assert mining.mb_pair_lift(spark, sf_dir).count() == unpruned


def test_entropy_bounds(spark, sf_dir):
    for r in mining.stat_entropy(spark, sf_dir).collect():
        assert 0.0 <= r.gini < 1.0
        assert r.entropy >= -1e-9
        # H <= log2(number of observed classes)
        import math

        assert r.entropy <= math.log2(r.n_classes) + 1e-9


def test_knn_majority_vote_shape(spark, sf_dir):
    out = mining.knn_label_classify(spark, sf_dir).collect()
    assert out, "no held-out queries"
    assert len(out) == len({r.q_id for r in out}), "one prediction per query"
    assert all(1 <= r.n_votes <= mining.KNN_K for r in out)


def test_column_profile_covers_every_column(spark, sf_dir):
    out = {r.column_name: r for r in mining.dq_column_profile(spark, sf_dir).collect()}
    assert set(out) == {c for c, _ in mining._PROFILE_COLS}
    o = load(spark, sf_dir, "orders")
    n = o.count()
    for r in out.values():
        assert r.n_rows == n
        assert 0 <= r.n_distinct <= n
    assert out["o_orderstatus"].min_str is not None
    assert out["o_totalprice"].min_num is not None


def test_prefix_setjoin_has_perfect_recall_vs_bruteforce(spark, sf_dir):
    """The prefix filter must lose no pair: compare against an in-Spark
    brute-force all-pairs join at test scale."""
    from pasardassist_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    from pasardassist_spark.operators.text import word_ngrams

    docs = load(spark, sf_dir, "documents")
    tau = 0.9
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filtered_jaccard_pairs(
            docs, "text", "doc_id", tau, ngram=3
        ).collect()
    }
    toks = F.array_distinct(
        word_ngrams(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: x != F.lit(""),
            ),
            3,
        )
    )
    t = docs.select(F.col("doc_id").alias("id"), toks.alias("tk")).filter(
        F.size("tk") > 0
    )
    a = t.select(F.col("id").alias("da"), F.col("tk").alias("ta"))
    b = t.select(F.col("id").alias("db"), F.col("tk").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.col("na") + F.col("nb") - inter
    brute = (
        a.crossJoin(b)
        .filter(F.col("da") < F.col("db"))
        .withColumn("na", F.size("ta"))
        .withColumn("nb", F.size("tb"))
        .filter((union > 0) & (inter.cast("double") / union >= tau))
        .select("da", "db")
        .collect()
    )
    want = {(r.da, r.db) for r in brute}
    assert set(got) == want
    assert all(v >= tau for v in got.values())


def test_prefix_setjoin_plan_never_goes_all_pairs(spark, sf_dir):
    from pasardassist_spark.plans.inspect import plan
    from pasardassist_spark.queries import dedup as qd

    p = plan(qd.dedup_setjoin_prefix(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_band_self_join_covers_bucket_edges(spark):
    """Pairs straddling a bucket boundary (|diff| <= eps but different
    buckets) must be found, pairs just outside the band must not, and no
    pair may be emitted twice."""
    from pasardassist_spark.operators.rangejoin import band_self_join

    rows = [
        (1, "g", 9.9), (2, "g", 10.1),   # straddles the eps=1 bucket edge
        (3, "g", 11.2),                   # 1.1 from id 2 -> out of band
        (4, "g", 9.9),                    # duplicate value, same bucket
        (5, "h", 10.0),                   # other key group: never pairs
    ]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    out = band_self_join(df, ["k"], "id", "v", eps=1.0).collect()
    got = sorted((r.id_a, r.id_b) for r in out)
    assert got == [(1, 2), (1, 4), (2, 4)]
    assert len(got) == len(set(got)), "pair emitted twice"


def test_band_join_query_matches_direct_theta(spark, sf_dir):
    out = {
        (r.id_a, r.id_b)
        for r in mining.rj_price_band_pairs(spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.date_trunc("day", "o_orderdate").alias("d"),
        F.col("o_totalprice").alias("p"),
    )
    a, b = o.alias("a"), o.alias("b")
    direct = (
        a.join(
            b,
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.k") < F.col("b.k"))
            & (
                F.abs(F.col("a.p") - F.col("b.p")) <= mining.BAND_EPS
            ),
        )
        .select(F.col("a.k").alias("x"), F.col("b.k").alias("y"))
        .collect()
    )
    assert out == {(r.x, r.y) for r in direct}


def test_debounce_burst_semantics(spark):
    """Trailing-gap debounce: a chain of close events is ONE burst even
    when it exceeds the gap end-to-end; a gap > threshold opens a new
    burst per (user, type)."""
    from datetime import datetime as dt

    from pasardassist_spark.queries.analytics import (
        _DEBOUNCE_GAP_S,
        dedup_debounce,
    )

    assert _DEBOUNCE_GAP_S == 300
    base = dt(2024, 1, 1, 12, 0, 0)

    def t(s):
        return base.replace(minute=s // 60, second=s % 60)

    rows = [
        # burst 1: 0s, 250s, 500s (each within 300s of previous; chain
        # spans 500s > gap — still one burst under trailing-gap rules)
        (1, t(0), 10, "view", 0.0, "{}"),
        (2, t(250), 10, "view", 0.0, "{}"),
        (3, t(500), 10, "view", 0.0, "{}"),
        # burst 2 opens 301s after the last event
        (4, t(802), 10, "view", 0.0, "{}"),
        # other type: independent clock
        (5, t(10), 10, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import pasardassist_spark.queries.analytics as A
    import pasardassist_spark.tables as T

    orig_t, orig_a = T.load, A.load
    try:
        T.load = lambda spark, sf_dir, name: df  # noqa: ARG005
        A.load = T.load
        out = {
            r.event_id: r.n_suppressed
            for r in dedup_debounce(spark, "ignored").collect()
        }
    finally:
        T.load, A.load = orig_t, orig_a
    assert out == {1: 2, 4: 0, 5: 0}


def test_cohort_ltv_is_monotone_per_cohort(spark, sf_dir):
    from pasardassist_spark.queries.analytics import cohort_ltv

    rows = cohort_ltv(spark, sf_dir).collect()
    assert rows
    by_c: dict = {}
    for r in rows:
        by_c.setdefault(r.cohort, []).append((r.age_months, r.ltv, r.n_users))
    for series in by_c.values():
        series.sort()
        assert all(a >= 0 for a, _, _ in series)
        vals = [v for _, v, _ in series]
        assert vals == sorted(vals), "cumulative LTV must be non-decreasing"
        assert len({n for _, _, n in series}) == 1, "cohort size constant"


def test_funnel_latency_within_lookback(spark, sf_dir):
    from pasardassist_spark.queries.analytics import (
        _LAT_WINDOW_US,
        funnel_latency,
    )

    for r in funnel_latency(spark, sf_dir).collect():
        assert 0 <= r.p50_us <= r.p90_us <= r.max_us <= _LAT_WINDOW_US
        assert r.n_conversions >= 1


def test_band_self_join_handles_negative_values(spark):
    """floor()-bucketing must stay correct below zero (floor, not
    truncation: -0.4 lands in bucket -1)."""
    from pasardassist_spark.operators.rangejoin import band_self_join

    rows = [(1, "g", -0.4), (2, "g", 0.4), (3, "g", -1.6), (4, "g", 2.0)]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    got = sorted(
        (r.id_a, r.id_b)
        for r in band_self_join(df, ["k"], "id", "v", eps=1.0).collect()
    )
    # |v1-v2|<=1: (1,2)=0.8 ok, (1,3)=1.2 no, (2,4)=1.6 no, (3,4)=3.6 no
    assert got == [(1, 2)]


def test_skyline_degenerate_single_x_group(spark):
    """All rows share one x: only the max-y rows (ties included) survive."""
    df = spark.createDataFrame(
        [(0, 1.0, 5), (1, 1.0, 9), (2, 1.0, 9), (3, 1.0, 2)],
        "id long, x double, y int",
    )
    assert {r.id for r in skyline(df, "x", "y").collect()} == {1, 2}


def test_band_self_join_carry_columns(spark):
    """carry= payload columns ride the candidate pairs correctly: each
    _a/_b value matches the row its id came from, and the pair set is
    unchanged by carrying."""
    from pasardassist_spark.operators.rangejoin import band_self_join

    rows = [(1, "k", 1.0, "p1"), (2, "k", 1.6, "p2"), (3, "k", 3.1, "p3"),
            (4, "k", 3.4, "p4"), (5, "z", 1.1, "p5")]
    df = spark.createDataFrame(rows, "id long, k string, v double, name string")
    out = band_self_join(df, ["k"], "id", "v", eps=1.0, carry=["name"]).collect()
    names = {i: n for i, _, _, n in rows}
    pairs = {(r.id_a, r.id_b) for r in out}
    assert pairs == {(1, 2), (3, 4)}
    for r in out:
        assert r.name_a == names[r.id_a] and r.name_b == names[r.id_b]
    bare = band_self_join(df, ["k"], "id", "v", eps=1.0).collect()
    assert {(r.id_a, r.id_b) for r in bare} == pairs


# ------------------------------------------------------ label propagation


def _lpa(spark, pairs, iters=5):
    from pasardassist_spark.operators.components import label_propagation

    e = spark.createDataFrame(pairs, ["a", "b"])
    return {
        r.node: r.community
        for r in label_propagation(e, "a", "b", max_iter=iters).collect()
    }


def _clique(ids):
    return [(a, b) for a in ids for b in ids if a < b]


def test_lpa_two_cliques_with_bridge(spark):
    """Two 6-cliques joined by one bridge edge resolve to exactly two
    communities (the bridge must NOT merge them — the property that
    separates LPA from connected components)."""
    pairs = _clique(range(6)) + _clique(range(10, 16)) + [(5, 10)]
    got = _lpa(spark, pairs)
    assert len({got[v] for v in range(6)}) == 1
    assert len({got[v] for v in range(10, 16)}) == 1
    assert got[0] != got[10]


def test_lpa_single_clique_converges_to_min_id(spark):
    got = _lpa(spark, _clique([3, 7, 11, 19]))
    assert set(got.values()) == {3}


def test_lpa_disconnected_components_stay_distinct(spark):
    pairs = _clique(range(4)) + _clique(range(100, 104))
    got = _lpa(spark, pairs)
    assert {got[v] for v in range(4)} != {got[v] for v in range(100, 104)}


def test_lpa_deterministic(spark):
    pairs = _clique(range(5)) + _clique(range(20, 26)) + [(4, 20), (1, 25)]
    assert _lpa(spark, pairs) == _lpa(spark, pairs)
