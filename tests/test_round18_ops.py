"""Round-18 debut operators: Cochran's Q, Good-Turing smoothing,
DP top-k (Gumbel-max), and mutual-kNN Adamic-Adar link prediction.
Each is oracle-gated in the driver window; these pytests pin the
from-first-principles semantics and the release contracts."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pasardassist_spark.queries.matching import COCHRAN_YEARS, stat_cochran_q
from pasardassist_spark.queries.mining import (
    LP_KNN_K,
    LP_TOPN,
    graph_adamic_adar,
)
from pasardassist_spark.queries.privacy import (
    DP_EPSILON,
    DP_TOPK_K,
    privacy_dp_topk,
)
from pasardassist_spark.queries.text import GT_MAX_R, text_good_turing


def test_cochran_q_first_principles(spark, sf_dir):
    """Recompute Q with pandas from the raw parquet and compare."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_orderdate.dt.year.isin(COCHRAN_YEARS)]
    x = (
        o.assign(y=o.o_orderdate.dt.year,
                 hit=(o.o_orderpriority == "1-URGENT").astype(int))
        .groupby(["o_custkey", "y"])["hit"].max().reset_index()
    )
    complete = x.groupby("o_custkey").filter(
        lambda g: len(g) == len(COCHRAN_YEARS)
    )
    k = len(COCHRAN_YEARS)
    g = complete.groupby("y")["hit"].sum()
    l = complete.groupby("o_custkey")["hit"].sum()
    denom = k * l.sum() - (l * l).sum()
    q_exp = (k - 1) * (k * (g * g).sum() - g.sum() ** 2) / denom
    row = stat_cochran_q(spark, sf_dir).collect()[0]
    assert row["n_subjects"] == complete.o_custkey.nunique()
    assert row["k_treatments"] == k
    assert row["dof"] == k - 1
    assert row["q_stat"] == pytest.approx(round(q_exp, 6), abs=2e-6)


def test_good_turing_first_principles(spark, sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from collections import Counter

    keyed = Counter()
    for doc_id, text in zip(d.doc_id, d.text):
        for w in text.strip().split():
            if w:
                keyed[(doc_id, w)] += 1
    nr = Counter(keyed.values())
    n_tokens = sum(r * n for r, n in nr.items())
    p0 = round(nr.get(1, 0) / n_tokens, 6)
    rows = {r["r"]: r for r in text_good_turing(spark, sf_dir).collect()}
    assert set(rows) == {r for r in nr if r <= GT_MAX_R}
    for r, row in rows.items():
        assert row["n_r"] == nr[r]
        assert row["p_unseen"] == pytest.approx(p0, abs=2e-6)
        if nr.get(r + 1):
            exp = round((r + 1) * nr[r + 1] / nr[r], 6)
            assert row["r_star"] == pytest.approx(exp, abs=2e-6)
        else:
            assert row["r_star"] is None


def test_dp_topk_release_contract(spark, sf_dir):
    rows = privacy_dp_topk(spark, sf_dir).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, DP_TOPK_K + 1))
    # true counts agree with the exact aggregate
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    exact = cust.groupby(["c_nationkey", "c_mktsegment"]).size()
    for r in rows:
        assert r["true_count"] == exact[(r["c_nationkey"], r["c_mktsegment"])]
    # reproducible (seeded noise): a second run is identical
    again = privacy_dp_topk(spark, sf_dir).orderBy("rank").collect()
    assert rows == again
    # the Gumbel perturbation is bounded-from-count in distribution
    # terms but each released score must exceed the count minus nothing
    # deterministic — just sanity: score is finite and rank-ordered
    scores = [r["noisy_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(math.isfinite(s) for s in scores)


def test_dp_topk_k_guard(spark):
    from pasardassist_spark.operators.privacy import dp_topk

    df = spark.createDataFrame([("a",)], "c string")
    with pytest.raises(ValueError, match="k must be"):
        dp_topk(df, ["c"], 0, 1.0)


def test_adamic_adar_release_contract(spark, sf_dir):
    rows = graph_adamic_adar(spark, sf_dir).orderBy("rank").collect()
    assert 0 < len(rows) <= LP_TOPN
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["a"] < r["b"]
        assert r["common_neighbors"] >= 1
        assert 0.0 < r["jaccard"] <= 1.0
        # AA of cn common neighbors each of degree <= 2*LP_KNN_K (mutual
        # graph degree bound... mutual degree <= LP_KNN_K) is at least
        # cn / ln(LP_KNN_K) lower-bounded and positive
        assert r["adamic_adar"] > 0
    key = [(-r["adamic_adar"], r["a"], r["b"]) for r in rows]
    assert key == sorted(key)


def test_adamic_adar_excludes_edges_and_matches_bruteforce(spark, sf_dir):
    """Recompute the mutual-kNN graph + AA scores with numpy/pandas and
    compare the released pairs and 6-dp scores."""
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb.vec_id.to_numpy()
    v = np.stack(emb.embedding.to_numpy()).astype(float)
    nv = v / np.sqrt((v * v).sum(axis=1, keepdims=True))
    cos = np.round(nv @ nv.T, 6)
    np.fill_diagonal(cos, -np.inf)
    n = len(ids)
    order = np.lexsort((ids[None, :].repeat(n, 0), -cos), axis=1)
    knn = {
        ids[i]: {ids[j] for j in order[i][:LP_KNN_K]} for i in range(n)
    }
    edges = {
        (min(a, b), max(a, b))
        for a in knn
        for b in knn[a]
        if a in knn[b]
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cand = {}
    for z, nbrs in adj.items():
        dz = len(nbrs)
        for a in nbrs:
            for b in nbrs:
                if a < b and (a, b) not in edges:
                    cn, aa = cand.get((a, b), (0, 0.0))
                    cand[(a, b)] = (cn + 1, aa + 1.0 / math.log(dz))
    exp = {
        (a, b): (
            cn,
            round(aa, 6),
            round(cn / (len(adj[a]) + len(adj[b]) - cn), 6),
        )
        for (a, b), (cn, aa) in cand.items()
    }
    got = graph_adamic_adar(spark, sf_dir).collect()
    for r in got:
        pair = (r["a"], r["b"])
        assert pair not in edges
        cn, aa, jc = exp[pair]
        assert r["common_neighbors"] == cn
        assert r["adamic_adar"] == pytest.approx(aa, abs=2e-6)
        assert r["jaccard"] == pytest.approx(jc, abs=2e-6)
    # the released set IS the top-LP_TOPN by (aa desc, a, b)
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))
    assert {(r["a"], r["b"]) for r in got} == {
        p for p, _ in ranked[: len(got)]
    }


def test_qnorm_textbook_quantiles():
    from pasardassist_spark.queries.matching import _qnorm

    assert _qnorm(0.975) == pytest.approx(1.959964, abs=1e-6)
    assert _qnorm(0.995) == pytest.approx(2.575829, abs=1e-6)
    assert _qnorm(0.5) == pytest.approx(0.0, abs=1e-9)
    assert _qnorm(0.0228) == pytest.approx(-1.9991, abs=1e-3)
    with pytest.raises(ValueError):
        _qnorm(0.0)


def test_dunn_first_principles(spark, sf_dir):
    """Recompute tie-corrected Dunn z with pandas average ranks."""
    from pasardassist_spark.queries.matching import stat_dunn_posthoc

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["value", "event_type"]]
    ev["rank"] = ev["value"].rank(method="average")
    n = len(ev)
    t = ev.groupby("value").size()
    tie_term = (t**3 - t).sum() / (12.0 * (n - 1))
    g = ev.groupby("event_type").agg(n_g=("rank", "size"),
                                     mean_rank=("rank", "mean"))
    rows = stat_dunn_posthoc(spark, sf_dir).collect()
    ks = len(g)
    assert len(rows) == ks * (ks - 1) // 2
    for r in rows:
        ga, gb = g.loc[r["group_a"]], g.loc[r["group_b"]]
        assert r["n_a"] == ga.n_g and r["n_b"] == gb.n_g
        assert r["mean_rank_a"] == pytest.approx(ga.mean_rank, abs=2e-6)
        z = (ga.mean_rank - gb.mean_rank) / math.sqrt(
            (n * (n + 1) / 12.0 - tie_term) * (1.0 / ga.n_g + 1.0 / gb.n_g)
        )
        assert r["z"] == pytest.approx(round(z, 6), abs=2e-6)


# ---------------------------------------------------------------- batch 2


def test_mcnemar_first_principles(spark, sf_dir):
    """Recompute b01/c10/chi2 with pandas from the raw parquet."""
    from pasardassist_spark.queries.matching import MCNEMAR_YEARS, stat_mcnemar

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_orderdate.dt.year.isin(MCNEMAR_YEARS)]
    y0, y1 = MCNEMAR_YEARS
    o = o.assign(y=o.o_orderdate.dt.year,
                 hit=(o.o_orderpriority == "1-URGENT").astype(int))
    piv = o.groupby(["o_custkey", "y"])["hit"].max().unstack()
    piv = piv.dropna()
    b01 = int(((piv[y0] == 0) & (piv[y1] == 1)).sum())
    c10 = int(((piv[y0] == 1) & (piv[y1] == 0)).sum())
    row = stat_mcnemar(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == len(piv)
    assert (row["b01"], row["c10"]) == (b01, c10)
    if b01 + c10 > 0:
        assert row["chi2_cc"] == pytest.approx(
            (abs(b01 - c10) - 1) ** 2 / (b01 + c10), abs=1e-6
        )
    else:
        assert row["chi2_cc"] is None


def test_kendall_tau_vs_scipy_formula(spark, sf_dir):
    """tau-b via the cell-pair form equals the direct pandas corr."""
    from pasardassist_spark.queries.matching import stat_kendall_tau

    import numpy as np

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_linenumber"]
    )
    # tau-b from the contingency table (no scipy in the container):
    # C/D via the 2-D suffix-sum of the cell counts, ties from marginals
    ct = pd.crosstab(li.l_quantity.astype(int),
                     li.l_linenumber.astype(int)).to_numpy().astype(np.int64)
    conc = disc = 0
    R, Cn = ct.shape
    for i in range(R):
        for j in range(Cn):
            conc += ct[i, j] * ct[i + 1:, j + 1:].sum()
            disc += ct[i, j] * ct[i + 1:, :j].sum()
    n = ct.sum()
    n0 = n * (n - 1) // 2
    tx = sum(t * (t - 1) // 2 for t in ct.sum(axis=1))
    ty = sum(t * (t - 1) // 2 for t in ct.sum(axis=0))
    expected = (conc - disc) / math.sqrt(float(n0 - tx) * float(n0 - ty))
    row = stat_kendall_tau(spark, sf_dir).collect()[0]
    assert row["n"] == len(li)
    assert row["tau_b"] == pytest.approx(expected, abs=1e-6)
    # pair identity: conc+disc+ties <= n0; tie columns positive
    n0 = row["n"] * (row["n"] - 1) // 2
    assert row["conc"] + row["disc"] <= n0
    assert 0 < row["tie_pairs_x"] < n0 and 0 < row["tie_pairs_y"] < n0


def test_cronbach_alpha_first_principles(spark, sf_dir):
    """alpha from the pandas pivot (population variances) matches."""
    from pasardassist_spark.queries.matching import (
        CRONBACH_ITEMS,
        stat_cronbach_alpha,
    )

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    want = list(range(1, CRONBACH_ITEMS + 1))
    keep = li.groupby("l_orderkey")["l_linenumber"].apply(
        lambda s: sorted(s) == want
    )
    x = li[li.l_orderkey.isin(keep[keep].index)]
    piv = x.pivot_table(index="l_orderkey", columns="l_linenumber",
                        values="l_quantity")
    item_var = piv.var(ddof=0).sum()
    tot_var = piv.sum(axis=1).var(ddof=0)
    k = CRONBACH_ITEMS
    expected = k / (k - 1) * (1 - item_var / tot_var)
    row = stat_cronbach_alpha(spark, sf_dir).collect()[0]
    assert row["n_subjects"] == len(piv)
    assert row["alpha"] == pytest.approx(expected, abs=1e-5)


def test_randomized_response_debias_and_privacy(spark, sf_dir):
    """The debiased estimate must beat the raw reported rate as an
    estimator of the true rate (utility), and the flip coin must flip a
    nontrivial share of rows (privacy: reported != truth somewhere)."""
    from pasardassist_spark.queries.privacy import (
        RR_P,
        privacy_randomized_response,
    )

    rows = privacy_randomized_response(spark, sf_dir).collect()
    assert rows
    n_tot = sum(r["n"] for r in rows)
    rep_tot = sum(r["reported_yes"] for r in rows)
    true_tot = sum(round(r["true_rate"] * r["n"]) for r in rows)
    # the flip rate should be ~(1-p): reported-yes mass moves toward 1/2
    obs = rep_tot / n_tot
    truth = true_tot / n_tot
    assert abs(obs - 0.5) < abs(truth - 0.5) + 1e-9  # noise pulls to 1/2
    # aggregate debiased estimate within 5pp of the truth at any test SF
    est_tot = sum(r["est_rate"] * r["n"] for r in rows) / n_tot
    assert abs(est_tot - truth) < 0.05
    # per-group estimates are finite and the formula inverts the mixing
    for r in rows:
        raw = r["reported_yes"] / r["n"]
        assert r["est_rate"] == pytest.approx(
            (raw - (1 - RR_P)) / (2 * RR_P - 1), abs=1e-6
        )


def test_ridge_normal_eq_vs_numpy(spark, sf_dir):
    """Closed-form Cramer solve equals numpy's ridge solution."""
    import numpy as np

    from pasardassist_spark.queries.mining import (
        RIDGE_LAMBDA,
        ml_ridge_normal_eq,
    )

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice"],
    )
    x1 = li.l_quantity.to_numpy().astype(np.int64)
    x2 = np.round(li.l_discount.to_numpy() * 100).astype(np.int64)
    y = np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    X = np.stack([np.ones_like(x1), x1, x2], axis=1).astype(float)
    pen = np.diag([0.0, RIDGE_LAMBDA, RIDGE_LAMBDA])
    beta = np.linalg.solve(X.T @ X + pen, X.T @ y.astype(float))
    row = ml_ridge_normal_eq(spark, sf_dir).collect()[0]
    assert row["n"] == len(li)
    assert row["b0_cents"] == pytest.approx(beta[0], rel=1e-6, abs=1e-4)
    assert row["b1_cents_per_qty"] == pytest.approx(beta[1], rel=1e-6)
    assert row["b2_cents_per_disc100"] == pytest.approx(beta[2], rel=1e-6)


def test_durbin_watson_first_principles(spark, sf_dir):
    """DW from explicit residuals (pandas) equals the expanded form."""
    from pasardassist_spark.queries.analytics import stat_durbin_watson

    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    anchor = pd.Timestamp("2024-01-01")
    ev = ev.assign(x=(ev.ts.dt.normalize() - anchor).dt.days)
    daily = ev.groupby(["event_type", "x"]).size().rename("y").reset_index()
    out = {r["event_type"]: r for r in
           stat_durbin_watson(spark, sf_dir).collect()}
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("x")
        n = len(g)
        b, a = None, None
        import numpy as np

        coef = np.polyfit(g.x.to_numpy(float), g.y.to_numpy(float), 1)
        b, a = coef[0], coef[1]
        e = g.y.to_numpy(float) - (a + b * g.x.to_numpy(float))
        dw = np.sum(np.diff(e) ** 2) / np.sum(e**2)
        row = out[et]
        assert row["n_days"] == n
        assert row["slope"] == pytest.approx(b, abs=1e-5)
        assert row["dw"] == pytest.approx(dw, abs=1e-5)
        # DW lives in [0, 4]
        assert 0.0 <= row["dw"] <= 4.0


def test_hits_first_principles(spark, sf_dir):
    """Recompute 2-round L1-normalized HITS with pandas/numpy."""
    import numpy as np

    from pasardassist_spark.queries.mining import HITS_ITERS, graph_hits

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    e = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    w = (e.groupby(["o_custkey", "l_suppkey"]).size()
         .rename("w").reset_index())
    custs = sorted(w.o_custkey.unique())
    supps = sorted(w.l_suppkey.unique())
    ci = {c: i for i, c in enumerate(custs)}
    si = {s: i for i, s in enumerate(supps)}
    M = np.zeros((len(custs), len(supps)))
    for r in w.itertuples():
        M[ci[r.o_custkey], si[r.l_suppkey]] = r.w
    h = np.full(len(custs), 1.0 / len(custs))
    for _ in range(HITS_ITERS):
        a = M.T @ h
        a /= a.sum()
        h = M @ a
        h /= h.sum()
    out = {r["node"]: r for r in graph_hits(spark, sf_dir).collect()}
    assert len(out) == len(custs) + len(supps)
    for c in custs[:50]:
        r = out[f"c{c}"]
        assert r["kind"] == "hub"
        assert r["score"] == pytest.approx(h[ci[c]], abs=2e-6)
    for s in supps[:50]:
        r = out[f"s{s}"]
        assert r["kind"] == "authority"
        assert r["score"] == pytest.approx(a[si[s]], abs=2e-6)
    # L1 normalization: each side sums to ~1
    assert sum(r["score"] for r in out.values() if r["kind"] == "hub") \
        == pytest.approx(1.0, abs=1e-3)


def test_forecast_accuracy_first_principles(spark, sf_dir):
    """Recompute the four metrics from the pandas daily series."""
    import numpy as np

    from pasardassist_spark.queries.trends import ts_forecast_accuracy

    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    daily = (o.assign(c=np.round(o.o_totalprice * 100).astype(np.int64))
             .groupby("o_orderdate")["c"].sum().sort_index())
    y = daily.to_numpy()
    f1, f7 = y[6:-1], y[:-7]
    yy = y[7:]
    e1, e7 = yy - f1, yy - f7
    row = ts_forecast_accuracy(spark, sf_dir).collect()[0]
    assert row["m"] == len(yy)
    assert row["mae_naive_usd"] == pytest.approx(
        np.abs(e1).mean() / 100, abs=1e-4)
    assert row["mase_snaive"] == pytest.approx(
        np.abs(e7).sum() / np.abs(e1).sum(), abs=1e-6)
    assert row["wape_snaive"] == pytest.approx(
        np.abs(e7).sum() / yy.sum(), abs=1e-6)
    assert row["theil_u2"] == pytest.approx(
        float(np.sqrt((e7.astype(float) ** 2).sum()
                      / (e1.astype(float) ** 2).sum())), abs=1e-6)


def test_yule_k_known_values(spark, sf_dir):
    """Hand-check the spectrum formula on a few docs + invariants."""
    from collections import Counter

    from pasardassist_spark.queries.text import text_yule_k

    rows = text_yule_k(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == len(docs)
    for rec in docs.head(25).itertuples():
        toks = rec.text.strip().split()
        c = Counter(toks)
        n, v = len(toks), len(c)
        smm = sum(m * m for m in c.values())
        r = by_id[rec.doc_id]
        assert (r["n_tokens"], r["v_types"]) == (n, v)
        assert r["ttr"] == pytest.approx(v / n, abs=1e-6)
        assert r["yule_k"] == pytest.approx(1e4 * (smm - n) / n**2, abs=1e-4)
        assert r["yule_k"] >= 0.0


def test_jonckheere_first_principles(spark, sf_dir):
    """Recompute 2*JT, E, and the tie-corrected variance with pandas."""
    import numpy as np

    from pasardassist_spark.queries.matching import (
        JT_PRIORITIES,
        stat_jonckheere,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority"])
    x = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    gmap = {p: i + 1 for i, p in enumerate(JT_PRIORITIES)}
    x["g"] = x.o_orderpriority.map(gmap)
    x["v"] = x.l_quantity.astype(int)
    cells = x.groupby(["g", "v"]).size().rename("n").reset_index()
    jt2 = 0
    arr = cells.to_numpy()
    for g1, v1, n1 in arr:
        for g2, v2, n2 in arr:
            if g1 < g2:
                if v1 < v2:
                    jt2 += 2 * n1 * n2
                elif v1 == v2:
                    jt2 += n1 * n2
    N = len(x)
    ni = x.groupby("g").size().to_numpy()
    tj = x.groupby("v").size().to_numpy()
    e = (N * N - (ni**2).sum()) / 4
    var = (
        (N * (N - 1) * (2 * N + 5)
         - (ni * (ni - 1) * (2 * ni + 5)).sum()
         - (tj * (tj - 1) * (2 * tj + 5)).sum()) / 72.0
        + float((ni * (ni - 1) * (ni - 2)).sum())
        * float((tj * (tj - 1) * (tj - 2)).sum())
        / (36.0 * N * (N - 1) * (N - 2))
        + float((ni * (ni - 1)).sum()) * float((tj * (tj - 1)).sum())
        / (8.0 * N * (N - 1))
    )
    row = stat_jonckheere(spark, sf_dir).collect()[0]
    assert row["n"] == N
    assert row["jt_stat"] == pytest.approx(jt2 / 2, abs=1e-6)
    assert row["e_jt"] == pytest.approx(e, abs=1e-4)
    assert row["var_jt"] == pytest.approx(var, rel=1e-9)
    assert row["z"] == pytest.approx((jt2 / 2 - e) / np.sqrt(var), abs=1e-5)


def test_effect_sizes_first_principles(spark, sf_dir):
    """Cohen's d / Hedges' g / Glass's delta against pandas."""
    import numpy as np

    from pasardassist_spark.queries.matching import (
        ES_GROUP_A,
        ES_GROUP_B,
        stat_effect_sizes,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority"])
    x = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    a = x[x.o_orderpriority == ES_GROUP_A].l_quantity.to_numpy(float)
    b = x[x.o_orderpriority == ES_GROUP_B].l_quantity.to_numpy(float)
    n1, n2 = len(a), len(b)
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    sp = np.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
    d = (a.mean() - b.mean()) / sp
    j = 1 - 3 / (4 * (n1 + n2 - 2) - 1)
    row = stat_effect_sizes(spark, sf_dir).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["mean_diff"] == pytest.approx(a.mean() - b.mean(), abs=1e-5)
    assert row["cohens_d"] == pytest.approx(d, abs=1e-6)
    assert row["hedges_g"] == pytest.approx(j * d, abs=1e-6)
    assert row["glass_delta"] == pytest.approx(
        (a.mean() - b.mean()) / np.sqrt(v2), abs=1e-6)
