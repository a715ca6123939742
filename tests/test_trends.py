"""Semantic checks for the trend family (queries/trends.py) beyond the
oracle hash-compare: spine density, LOCF carry, EWMA fixed points, and
z-score baseline hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasardassist_spark.queries.registry import REGISTRY, _load_all

_load_all()


def test_gap_fill_is_dense_and_locf_carries(spark, sf_dir):
    df = REGISTRY["ts_gap_fill"].fn(spark, sf_dir).cache()
    try:
        types = df.select("event_type").distinct().count()
        days = df.select("day").distinct().count()
        assert df.count() == types * days, "spine is not the full cross grid"
        # gap rows: zero events, NULL day_value, but locf_value present
        # whenever any prior day for that type had data
        gaps = df.filter(F.col("n_events") == 0)
        assert gaps.filter(F.col("day_value").isNotNull()).count() == 0
        # LOCF equals the most recent non-null day_value before the gap
        w_ok = df.filter(
            F.col("locf_value").isNotNull() & (F.col("n_events") > 0)
        )
        assert w_ok.filter(
            F.col("locf_value") != F.col("day_value")
        ).count() == 0, "LOCF must equal day_value on observed days"
    finally:
        df.unpersist()


def test_ewma_constant_series_fixed_point(spark, sf_dir):
    # On days where the last 8 observations are identical, the renormalized
    # EWMA equals that value exactly. Verify algebraically on real data by
    # checking ewma is always within [min, max] of the trailing window.
    df = REGISTRY["ts_ewma"].fn(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, 0)
    chk = df.select(
        "event_type",
        "day",
        "ewma",
        F.min("day_value").over(w).alias("lo"),
        F.max("day_value").over(w).alias("hi"),
    )
    bad = chk.filter(
        (F.col("ewma") < F.col("lo") - 1e-6)
        | (F.col("ewma") > F.col("hi") + 1e-6)
    )
    assert bad.count() == 0, "EWMA left the convex hull of its window"


def test_zscore_baseline_hygiene(spark, sf_dir):
    df = REGISTRY["ts_zscore_anomaly"].fn(spark, sf_dir).cache()
    try:
        # fewer than 3 baseline days -> no score, never an anomaly
        young = df.filter(F.col("baseline_days") < 3)
        assert young.filter(F.col("zscore").isNotNull()).count() == 0
        assert young.filter(F.col("is_anomaly")).count() == 0
        # every anomaly has a score with |z| > 2
        assert (
            df.filter(F.col("is_anomaly"))
            .filter(F.abs("zscore") <= 2.0)
            .count()
            == 0
        )
    finally:
        df.unpersist()


# ---------------------------------------------- Kneser-Ney LM scoring --


def _kn_reference(docs: dict[int, str], D: float = 0.75) -> dict[int, tuple[int, float]]:
    """Independent sequential interpolated-KN implementation (dict
    folds, no Spark/SQL), mirroring Chen & Goodman's formulas with the
    continuation-consistent trigram denominator."""
    import math
    from collections import Counter, defaultdict

    tris, bigs = Counter(), set()
    doc_tris = {}
    for did, text in docs.items():
        toks = text.split()
        tg = [tuple(toks[i : i + 3]) for i in range(len(toks) - 2)]
        doc_tris[did] = tg
        tris.update(tg)
        bigs.update((toks[i], toks[i + 1]) for i in range(len(toks) - 1))
    ctx_c, ctx_n1 = Counter(), Counter()
    mid_n1 = defaultdict(set)
    midden_n1, midden_fw = defaultdict(set), defaultdict(set)
    for (w1, w2, w3), c in tris.items():
        ctx_c[(w1, w2)] += c
        ctx_n1[(w1, w2)] += 1
        mid_n1[(w2, w3)].add(w1)
        midden_n1[w2].add((w1, w3))
        midden_fw[w2].add(w3)
    cont = Counter(b2 for _, b2 in bigs)
    n_bt = len(bigs)
    out = {}
    for did, tg in doc_tris.items():
        if not tg:
            continue
        lps = []
        for w1, w2, w3 in tg:
            pc = cont[w3] / n_bt
            p2 = (
                max(len(mid_n1[(w2, w3)]) - D, 0)
                + D * len(midden_fw[w2]) * pc
            ) / len(midden_n1[w2])
            p3 = (max(tris[(w1, w2, w3)] - D, 0) + D * ctx_n1[(w1, w2)] * p2) / ctx_c[(w1, w2)]
            lps.append(math.log10(p3))
        out[did] = (len(lps), round(sum(lps) / len(lps), 6))
    return out


def test_kneser_ney_matches_sequential_reference(spark, tmp_path):
    import pandas as pd

    from pasardassist_spark.queries.registry import REGISTRY

    docs = {
        0: "the cat sat on the mat and the cat ran",
        1: "the dog sat on the mat",
        2: "a cat and a dog sat",
        3: "the cat sat the cat sat the cat sat",
        4: "one two",          # < 3 tokens: drops out
        5: "unique tokens only here now",
    }
    pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}
    ).to_parquet(tmp_path / "documents.parquet")
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logprob"])
        for r in REGISTRY["curate_kneser_ney_ppl"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    want = _kn_reference(docs)
    assert set(got) == set(want)          # doc 4 absent from both
    for did in want:
        assert got[did][0] == want[did][0]
        assert abs(got[did][1] - want[did][1]) < 2e-6, (did, got[did], want[did])


def test_kneser_ney_probabilities_normalize():
    """For every seen context, total probability mass over the full
    follower vocabulary (seen trigram extensions at full strength,
    unseen ones through the backoff chain) sums to 1 — the property that
    distinguishes interpolated KN from an ad-hoc score."""
    from collections import Counter, defaultdict

    D = 0.75
    text = ("the cat sat on the mat and the dog sat on the rug while "
            "the cat ran and the dog ran the cat sat")
    toks = text.split()
    tris = Counter(tuple(toks[i : i + 3]) for i in range(len(toks) - 2))
    bigs = {(toks[i], toks[i + 1]) for i in range(len(toks) - 1)}
    ctx_c, ctx_n1 = Counter(), Counter()
    mid_n1 = defaultdict(set)
    midden_n1, midden_fw = defaultdict(set), defaultdict(set)
    for (w1, w2, w3), c in tris.items():
        ctx_c[(w1, w2)] += c
        ctx_n1[(w1, w2)] += 1
        mid_n1[(w2, w3)].add(w1)
        midden_n1[w2].add((w1, w3))
        midden_fw[w2].add(w3)
    cont = Counter(b2 for _, b2 in bigs)
    n_bt = len(bigs)
    vocab = {b2 for _, b2 in bigs}
    pc_total = sum(cont[w] / n_bt for w in vocab)
    assert abs(pc_total - 1.0) < 1e-12  # continuation dist normalizes
    for (w1, w2) in ctx_c:
        total = 0.0
        for w3 in vocab:
            pc = cont[w3] / n_bt
            p2 = (
                max(len(mid_n1[(w2, w3)]) - D, 0)
                + D * len(midden_fw[w2]) * pc
            ) / len(midden_n1[w2])
            p3 = (
                max(tris.get((w1, w2, w3), 0) - D, 0)
                + D * ctx_n1[(w1, w2)] * p2
            ) / ctx_c[(w1, w2)]
            total += p3
        assert abs(total - 1.0) < 1e-9, ((w1, w2), total)
