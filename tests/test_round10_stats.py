"""Round-10 statistics additions: Welch's t, one-way ANOVA, and their
internal identities — the invariants the driver's value-hash can't see."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pasardassist_spark.queries.registry import REGISTRY, _load_all
from pasardassist_spark.tables import load

_load_all()


def test_anova_partition_identity(spark, sf_dir):
    """SSB + SSW must equal the total sum of squares Σ(x - x̄)² — the
    ANOVA decomposition identity, computed here directly from the raw
    events so a bug in the grouped-moment assembly cannot self-confirm."""
    row = REGISTRY["stat_anova_oneway"].fn(spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events")
    grand = ev.agg(F.avg("value").alias("m")).collect()[0].m
    sst = (
        ev.select(((F.col("value") - grand) ** 2).alias("d"))
        .agg(F.sum("d").alias("sst"))
        .collect()[0]
        .sst
    )
    assert math.isclose(row.ss_between + row.ss_within, sst, rel_tol=1e-6)
    assert row.f_stat > 0
    assert row.k >= 2 and row.big_n > row.k


def test_welch_matches_direct_computation(spark, sf_dir):
    """The 2-row-frame Welch assembly must equal a direct two-collect
    computation of the same closed form (catches max/when pivot bugs)."""
    row = REGISTRY["stat_welch_ttest"].fn(spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events")

    def moments(et):
        r = (
            ev.filter(F.col("event_type") == et)
            .agg(
                F.count("*").alias("n"),
                F.avg("value").alias("m"),
                F.var_samp("value").alias("v"),
            )
            .collect()[0]
        )
        return r.n, r.m, r.v

    na, ma, va = moments("purchase")
    nb, mb, vb = moments("view")
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert row.n_a == na and row.n_b == nb
    assert math.isclose(row.t, t, abs_tol=1e-5)
    assert math.isclose(row.df, df, rel_tol=1e-5)
    assert row.significant == (abs(round(t, 6)) > 1.959964)


def test_stratified_split_exact_proportions(spark, sf_dir):
    """Per-stratum split sizes must hit floor(p·n/100) EXACTLY (the whole
    point vs hash-gate sampling), every doc appears once, and the
    assignment is deterministic across runs."""
    out = REGISTRY["split_stratified_exact"].fn(spark, sf_dir)
    rows = out.collect()
    again = REGISTRY["split_stratified_exact"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    docs = load(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    assert len({r.doc_id for r in rows}) == len(rows)

    per = {}
    for r in rows:
        per.setdefault(r.lang, {"train": 0, "val": 0, "test": 0})
        per[r.lang][r.split] += 1
    for lang, c in per.items():
        n = sum(c.values())
        assert c["train"] == (80 * n) // 100, (lang, c, n)
        assert c["train"] + c["val"] == (90 * n) // 100, (lang, c, n)


def test_theilsen_matches_sequential_reference(spark, sf_dir):
    """The distributed pair/median assembly must equal a pure-Python
    median-of-slopes on the identical gated point set."""
    import hashlib
    import statistics

    row = REGISTRY["stat_theilsen_line"].fn(spark, sf_dir).collect()[0]
    cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("x"), F.sum("o_totalprice").alias("y"))
        .collect()
    )
    pts = [
        (r.x, float(r.y))
        for r in cust
        if int(hashlib.md5(str(r.o_custkey).encode()).hexdigest()[:4], 16) < 6554
    ]
    slopes = [
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
        if x1 != x2
    ]
    # pair count is order-insensitive (every unordered pair with x1!=x2)
    assert row.k_points == len(pts)
    assert row.n_pairs == len(slopes)
    slope = statistics.median(slopes)
    intercept = statistics.median(y - slope * x for x, y in pts)
    assert math.isclose(row.slope, slope, rel_tol=1e-9)
    assert math.isclose(row.intercept, intercept, rel_tol=1e-9)


def test_readability_syllable_heuristic_and_bounds(spark, sf_dir):
    """Syllable counts must equal the vowel-group heuristic computed in
    Python over the same tokenization, and sentence re-lining must give
    ceil(words/8)."""
    import re

    rows = REGISTRY["text_readability"].fn(spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in load(spark, sf_dir, "documents").collect()}
    assert len(rows) == sum(1 for t in docs.values() if t.strip())
    for r in rows[:50]:
        words = docs[r.doc_id].strip().split()
        syl = sum(max(1, len(re.findall(r"[aeiouy]+", w))) for w in words)
        assert r.n_words == len(words)
        assert r.n_syllables == syl
        assert r.n_sentences == -(-len(words) // 8)
        est = 206.835 - 1.015 * (len(words) / r.n_sentences) - 84.6 * (syl / len(words))
        assert math.isclose(r.flesch_ease, est, abs_tol=1e-5)


def test_bootstrap_ci_statistical_sanity(spark, sf_dir):
    """The Poisson bootstrap interval must bracket the point mean, be
    ordered, and have width in a plausible range for n ~ 60k: roughly
    t * sd/sqrt(n) * 2 within a factor of 3 (the Poisson approximation
    and B=40 discretization both widen/narrow modestly)."""
    row = REGISTRY["stat_bootstrap_ci"].fn(spark, sf_dir).collect()[0]
    assert row.n_replicas == 40
    assert row.ci_lo < row.point_mean < row.ci_hi
    ev = load(spark, sf_dir, "events")
    st = ev.agg(
        F.stddev_samp("value").alias("sd"), F.count("*").alias("n")
    ).collect()[0]
    se = st.sd / math.sqrt(st.n)
    width = row.ci_hi - row.ci_lo
    assert 2 * 1.96 * se / 3 < width < 2 * 1.96 * se * 3


def test_bootstrap_weights_are_poisson1_like(spark, sf_dir):
    """The md5-derived weights must average ~1 with variance ~1 (the
    Poisson(1) moments), else the CDF breakpoints are wrong."""
    from pasardassist_spark.queries.matching import _POIS_CDF_U32, BOOT_B

    ev = load(spark, sf_dir, "events").select("event_id").limit(2000)
    r = ev.select(
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    )
    u32 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("event_id").cast("string"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(6)
    for k in range(len(_POIS_CDF_U32) - 1, -1, -1):
        w = F.when(u32 < _POIS_CDF_U32[k], F.lit(k)).otherwise(w)
    st = r.select(w.alias("w")).agg(
        F.avg("w").alias("m"), F.var_samp("w").alias("v")
    ).collect()[0]
    assert abs(st.m - 1.0) < 0.05
    assert abs(st.v - 1.0) < 0.1
