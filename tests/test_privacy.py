"""Privacy release audit operators (operators/privacy.py): k-anonymity,
l-diversity (distinct + entropy), t-closeness TVD, suppression release —
pinned against hand-computed ground truth on small frames; the registered
queries are additionally oracle-hashed by test_oracle_parity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pasardassist_spark.operators.privacy import (
    k_anonymity_classes,
    l_diversity,
    suppress_release,
    t_closeness,
)


def _micro(spark):
    # two QI classes: ("a", 1) has 6 rows (meets k=5), ("b", 2) has 2
    rows = [("a", 1, v) for v in (10, 10, 10, 10, 10, 20)]
    rows += [("b", 2, v) for v in (10, 30)]
    return spark.createDataFrame(rows, "seg string, nat int, s int")


def test_k_anonymity_classes(spark):
    got = {
        (r.seg, r.nat): (r.class_size, r.meets_k)
        for r in k_anonymity_classes(_micro(spark), ["seg", "nat"], 5).collect()
    }
    assert got == {("a", 1): (6, True), ("b", 2): (2, False)}


def test_l_diversity_distinct_and_entropy(spark):
    got = {
        (r.seg, r.nat): r
        for r in l_diversity(_micro(spark), ["seg", "nat"], "s", 2).collect()
    }
    a = got[("a", 1)]
    # class a: counts {10: 5, 20: 1} -> l_distinct 2, dominated entropy
    assert (a.class_size, a.l_distinct, a.meets_l) == (6, 2, True)
    h = -(5 / 6) * math.log(5 / 6) - (1 / 6) * math.log(1 / 6)
    assert abs(a.entropy_l - round(math.exp(h), 6)) < 1e-9
    assert a.entropy_l < a.l_distinct, "dominance must lower effective l"
    b = got[("b", 2)]
    # class b: uniform over 2 values -> entropy_l == l_distinct == 2
    assert (b.l_distinct, round(b.entropy_l, 6)) == (2, 2.0)


def test_t_closeness_matches_bruteforce_grid(spark):
    df = _micro(spark)
    rows = df.collect()
    total = len(rows)
    glob = {}
    for r in rows:
        glob[r.s] = glob.get(r.s, 0) + 1
    got = {
        (r.seg, r.nat): r
        for r in t_closeness(df, ["seg", "nat"], "s", 0.35).collect()
    }
    for key in {("a", 1), ("b", 2)}:
        cls = [r for r in rows if (r.seg, r.nat) == key]
        n_c = len(cls)
        cv = {}
        for r in cls:
            cv[r.s] = cv.get(r.s, 0) + 1
        tvd = 0.5 * sum(
            abs(cv.get(v, 0) / n_c - g / total) for v, g in glob.items()
        )
        r = got[key]
        assert r.class_size == n_c
        assert abs(r.tvd - round(tvd, 6)) < 1e-9, key
        assert r.meets_t == (r.tvd <= 0.35)


def test_suppress_release_invariants(spark):
    out = suppress_release(_micro(spark), ["seg", "nat"], 5)
    rows = out.collect()
    assert len(rows) == 8, "row grain preserved"
    kept = [r for r in rows if not r.suppressed]
    supp = [r for r in rows if r.suppressed]
    assert len(kept) == 6 and len(supp) == 2
    assert all(r.seg == "a" and r.nat == 1 for r in kept)
    assert all(r.seg is None and r.nat is None for r in supp), (
        "suppressed rows must null the whole QI tuple"
    )
    # post-release k-anonymity: every released class (incl. the merged
    # suppressed class) is >= k... unless the suppressed remainder is
    # itself < k, which the caller sees via the flag
    sizes = (
        out.groupBy("seg", "nat").count().collect()
    )
    assert {(r.seg, r.nat): r["count"] for r in sizes} == {
        ("a", 1): 6, (None, None): 2
    }


def test_privacy_queries_shapes(spark, sf_dir):
    """The registered queries on real testdata: class readouts at QI
    grain, release at row grain, thresholds applied."""
    from pasardassist_spark.queries.privacy import (
        privacy_k_anonymity,
        privacy_suppress_release,
        privacy_t_closeness,
    )
    from pasardassist_spark.tables import load

    n_cust = load(spark, sf_dir, "customer").count()
    k = privacy_k_anonymity(spark, sf_dir)
    n_classes = k.count()
    assert n_classes <= 25 * 5
    t = privacy_t_closeness(spark, sf_dir)
    assert t.count() == n_classes
    assert t.filter((F.col("tvd") < 0) | (F.col("tvd") > 1)).count() == 0
    rel = privacy_suppress_release(spark, sf_dir)
    assert rel.count() == n_cust
    # suppressed rows = rows of classes below k
    small = k.filter(~F.col("meets_k")).agg(F.sum("class_size")).first()[0]
    assert rel.filter("suppressed").count() == (small or 0)


def test_dp_noisy_counts_laplace_shape(spark):
    """The seeded Laplace mechanism: noise is nonzero, two-sided across
    groups, centered near 0, and scales like 1/epsilon (same seed ->
     10x epsilon shrinks every group's noise exactly 10x)."""
    from pasardassist_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [(g, i) for g in range(200) for i in range(3)], "g int, i int"
    )
    out = {r.g: r.noisy_count - r.true_count
           for r in dp_noisy_counts(df, ["g"], 1.0).collect()}
    noises = list(out.values())
    assert all(n != 0 for n in noises)
    pos = sum(1 for n in noises if n > 0)
    assert 60 <= pos <= 140, "signs should be roughly balanced"
    mean = sum(noises) / len(noises)
    assert abs(mean) < 0.35, f"Laplace(1) mean over 200 draws, got {mean}"
    tight = {r.g: r.noisy_count - r.true_count
             for r in dp_noisy_counts(df, ["g"], 10.0).collect()}
    for g, n in out.items():
        assert abs(tight[g] - n / 10) < 2e-5, "noise must scale as 1/eps"


def test_t_closeness_ordered_matches_bruteforce(spark):
    """Ordered EMD vs a hand-rolled cumulative over the global value
    domain — including a class that never exhibits the middle value
    (the cumulative must carry across it)."""
    from pasardassist_spark.operators.privacy import t_closeness_ordered

    rows = [("a", v) for v in (1, 1, 2, 3)] + [("b", v) for v in (1, 3, 3, 3)]
    df = spark.createDataFrame(rows, "g string, s int")
    got = {r.g: r for r in t_closeness_ordered(df, ["g"], "s", 0.3).collect()}
    total, dom = 8, [1, 2, 3]
    glob = {1: 3, 2: 1, 3: 4}
    for g, vals in (("a", {1: 2, 2: 1, 3: 1}), ("b", {1: 1, 3: 3})):
        n_c = sum(vals.values())
        cum, acc = 0.0, 0.0
        for v in dom:
            acc += vals.get(v, 0) / n_c - glob[v] / total
            cum += abs(acc)
        emd = cum / (len(dom) - 1)
        assert abs(got[g].emd - round(emd, 6)) < 1e-9, g
        assert got[g].meets_t == (got[g].emd <= 0.3)
    # degenerate single-value domain: EMD 0, not 0/0
    one = spark.createDataFrame([("a", 5), ("b", 5)], "g string, s int")
    assert all(
        r.emd == 0.0 for r in t_closeness_ordered(one, ["g"], "s", 0.3).collect()
    )


def test_null_qi_classes_audited_not_dropped(spark):
    """r17 review: a null QI value is a legitimate equivalence class —
    the struct-keyed joins must audit and release it, never drop it at
    an equi-join."""
    from pasardassist_spark.operators.privacy import (
        dp_noisy_counts as dpc,
        t_closeness as tc,
        t_closeness_ordered as tco,
    )

    rows = [("a", 1, 10), ("a", 1, 20), (None, 1, 10), (None, 1, 10),
            ("a", None, 20)]
    df = spark.createDataFrame(rows, "seg string, nat int, s int")
    for fn, val_col in ((tc, "tvd"), (tco, "emd")):
        out = fn(df, ["seg", "nat"], "s", 0.5).collect()
        keys = {(r.seg, r.nat) for r in out}
        assert keys == {("a", 1), (None, 1), ("a", None)}, fn.__name__
        sizes = {(r.seg, r.nat): r.class_size for r in out}
        assert sizes[(None, 1)] == 2 and sizes[("a", None)] == 1
        assert all(r[val_col] is not None for r in out)
    # t_closeness on the null-QI class: counts {10: 2}, global
    # {10: 3, 20: 2} -> TVD = 0.5*(|1-0.6| + 0.4) = 0.4
    tvd = {(r.seg, r.nat): r.tvd
           for r in tc(df, ["seg", "nat"], "s", 0.5).collect()}
    assert abs(tvd[(None, 1)] - 0.4) < 1e-9
    # suppression: the null-QI classes are below k and must be RELEASED
    # as suppressed rows, not silently dropped
    rel = suppress_release(df, ["seg", "nat"], 2).collect()
    assert len(rel) == 5, "row grain preserved through null QI"
    # classes: ("a",1)=2 >= 2 keep; (None,1)=2 keep; ("a",None)=1 suppress
    assert sum(1 for r in rel if r.suppressed) == 1


def test_null_sensitive_raises_loudly(spark):
    """r17 review: the t-closeness forms join on the sensitive value, so
    a null there must RAISE (packing's bucket-key convention), never
    silently drop or mis-score."""
    import pytest as _pytest

    from pasardassist_spark.operators.privacy import (
        t_closeness as tc,
        t_closeness_ordered as tco,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", None), ("b", 20)], "g string, s int"
    )
    for fn in (tc, tco):
        with _pytest.raises(Exception, match="null"):
            fn(df, ["g"], "s", 0.5).collect()


def test_dp_key_is_collision_free(spark):
    """r17 review: separator-containing values and null-vs-value swaps
    must draw INDEPENDENT noise — ('a|b','c') vs ('a','b|c') and
    ('a',null) vs (null,'a') formerly collided through concat_ws."""
    from pasardassist_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [("a|b", "c"), ("a", "b|c"), ("a", None), (None, "a")],
        "x string, y string",
    )
    out = dp_noisy_counts(df, ["x", "y"], 1.0).collect()
    assert len(out) == 4, "null QI groups must be released too"
    noises = sorted(round(r.noisy_count - r.true_count, 6) for r in out)
    assert len(set(noises)) == 4, f"colliding draws: {noises}"
