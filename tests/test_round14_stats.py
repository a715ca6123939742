"""Round-14 statistics additions: Friedman, Brown-Forsythe, Jarque-Bera,
Cramér's V — each checked against an independent textbook twin computed
directly from the raw tables (so a bug in the distributed assembly
cannot self-confirm through the shared oracle algebra)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from pasardassist_spark.queries.registry import REGISTRY, _load_all
from pasardassist_spark.tables import load

_load_all()


def _daily_cells(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(F.round(F.sum("value"), 6).alias("resp"))
        .collect()
    )


def test_friedman_matches_textbook_midranks(spark, sf_dir):
    """Mid-rank Friedman computed sequentially per block (lesser-count +
    (ties+1)/2 form) must equal the doubled-rank distributed assembly."""
    row = REGISTRY["stat_friedman"].fn(spark, sf_dir).collect()[0]
    blocks: dict = defaultdict(dict)
    for r in _daily_cells(spark, sf_dir):
        blocks[r.d][r.event_type] = r.resp
    k = len({t for v in blocks.values() for t in v})
    bl = {d: v for d, v in blocks.items() if len(v) == k}
    n = len(bl)
    rj: dict = defaultdict(float)
    tie3 = 0
    for v in bl.values():
        vals = sorted(v.values())
        cnt = Counter(vals)
        for c in cnt.values():
            tie3 += c**3 - c
        for t_name, val in v.items():
            lesser = sum(1 for x in vals if x < val)
            rj[t_name] += lesser + (cnt[val] + 1) / 2.0
    chi2 = 12.0 / (n * k * (k + 1)) * sum(
        r * r for r in rj.values()
    ) - 3 * n * (k + 1)
    chi2 /= 1 - tie3 / (n * (k**3 - k))
    assert row.n == n and row.k == k
    assert math.isclose(row.chi2_f, round(chi2, 6), abs_tol=2e-6)


def test_brown_forsythe_matches_textbook(spark, sf_dir):
    """W from per-group median-centered |z| computed sequentially."""
    row = REGISTRY["stat_brown_forsythe"].fn(spark, sf_dir).collect()[0]
    groups: dict = defaultdict(list)
    for r in _daily_cells(spark, sf_dir):
        groups[r.event_type].append(r.resp)

    def interp_median(vs):
        s = sorted(vs)
        m = len(s)
        if m % 2:
            return s[m // 2]
        return (s[m // 2 - 1] + s[m // 2]) / 2.0

    z = {
        t: [abs(x - interp_median(vs)) for x in vs]
        for t, vs in groups.items()
    }
    big_n = sum(len(v) for v in z.values())
    k = len(z)
    zbar = sum(sum(v) for v in z.values()) / big_n
    mean = lambda v: sum(v) / len(v)  # noqa: E731
    sb = sum(len(v) * (mean(v) - zbar) ** 2 for v in z.values())
    sw = sum(sum((x - mean(v)) ** 2 for x in v) for v in z.values())
    w = (big_n - k) / (k - 1) * sb / sw
    assert row.n == big_n and row.k == k
    assert math.isclose(row.w_stat, round(w, 6), abs_tol=2e-6)


def test_jarque_bera_matches_textbook(spark, sf_dir):
    """Central moments from one collected group; population g1/g2."""
    rows = {
        r.event_type: r
        for r in REGISTRY["stat_jarque_bera"].fn(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    vals = [
        r.value
        for r in ev.filter(F.col("event_type") == "click")
        .select("value")
        .collect()
    ]
    n = len(vals)
    m1 = sum(vals) / n
    c = [v - m1 for v in vals]
    m2 = sum(x * x for x in c) / n
    m3 = sum(x**3 for x in c) / n
    m4 = sum(x**4 for x in c) / n
    g1 = m3 / m2**1.5
    g2 = m4 / m2**2 - 3
    jb = n / 6 * (g1 * g1 + g2 * g2 / 4)
    got = rows["click"]
    assert got.n == n
    assert math.isclose(got.skew_g1, round(g1, 6), abs_tol=2e-6)
    assert math.isclose(got.kurt_g2, round(g2, 6), abs_tol=2e-6)
    assert math.isclose(got.jb_stat, round(jb, 6), abs_tol=2e-5)


def test_cramers_v_bounds_and_chi2_consistency(spark, sf_dir):
    """V in [0,1]; V == sqrt(chi2/(N*min(r-1,c-1))) from the SAME row;
    chi2 must equal stat_chi2_independence's statistic (shared
    contingency)."""
    row = REGISTRY["stat_cramers_v"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= row.cramers_v <= 1.0
    expect = math.sqrt(
        row.chi2 / (row.n_total * min(row.r - 1, row.c - 1))
    )
    assert math.isclose(row.cramers_v, round(expect, 6), abs_tol=2e-6)
    chi2_row = (
        REGISTRY["stat_chi2_independence"].fn(spark, sf_dir).collect()[0]
    )
    assert math.isclose(row.chi2, chi2_row.chi2, abs_tol=2e-6)
    assert row.n_total == chi2_row.n_total


def test_pacf_matches_yule_walker(spark, sf_dir):
    """Durbin-Levinson phi_mm must equal the last coefficient of the
    order-m Yule-Walker solve (numpy Toeplitz system) — an independent
    linear-algebra route to the same quantity."""
    import numpy as np

    acf = {
        r.lag: r.acf
        for r in REGISTRY["ts_acf"].fn(spark, sf_dir).collect()
    }
    pacf = {
        r.lag: r.pacf
        for r in REGISTRY["ts_pacf"].fn(spark, sf_dir).collect()
    }
    p = max(acf)
    r = np.array([1.0] + [acf[k] for k in range(1, p + 1)])
    for m in range(1, p + 1):
        R = np.empty((m, m))
        for i in range(m):
            for j in range(m):
                R[i, j] = r[abs(i - j)]
        phi = np.linalg.solve(R, r[1 : m + 1])
        assert math.isclose(pacf[m], round(float(phi[-1]), 6), abs_tol=2e-6)
    assert math.isclose(pacf[1], round(acf[1], 6), abs_tol=2e-6)


def test_kmeans_matches_sequential_lloyd(spark, sf_dir):
    """The distributed Lloyd sweep (posexplode moment aggregate,
    6-dp-rounded centroids) must reproduce a sequential numpy Lloyd
    with the identical init, rounding, and tie-break."""
    import numpy as np

    from pasardassist_spark.queries.mining import KMEANS_ITERS, KMEANS_K

    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    X = np.array([[float(x) for x in r.embedding] for r in rows])
    cents = np.round(X[:KMEANS_K].copy(), 6)
    for _ in range(KMEANS_ITERS):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # first-min tie-break, same as Spark
        new = cents.copy()
        for j in range(KMEANS_K):
            m = assign == j
            if m.any():
                new[j] = np.round(X[m].mean(axis=0), 6)
        cents = new
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    sizes = {j: int((assign == j).sum()) for j in range(KMEANS_K)}
    inertia = {
        j: float(d[assign == j].min(axis=1).sum()) for j in range(KMEANS_K)
    }
    got = {
        r.cluster: r
        for r in REGISTRY["ml_kmeans"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(sizes)
    for j in range(KMEANS_K):
        assert got[j].size == sizes[j], (j, got[j].size, sizes[j])
        assert math.isclose(got[j].inertia, inertia[j], abs_tol=1e-4)
        assert math.isclose(
            got[j].centroid_norm,
            round(float(np.sqrt((cents[j] ** 2).sum())), 6),
            abs_tol=2e-6,
        )


def test_cvm_matches_sequential_reference(spark, sf_dir):
    """Sequential Anderson-1962 T with pooled mid-ranks (the scipy
    cramervonmises_2samp construction) on the collected samples."""
    from pasardassist_spark.queries.matching import (
        MW_SAMPLE_A,
        MW_SAMPLE_B,
    )

    ev = load(spark, sf_dir, "events").select("event_type", "value")
    xs, ys = [], []
    for r in ev.collect():
        if r.event_type == MW_SAMPLE_A:
            xs.append(r.value)
        elif r.event_type == MW_SAMPLE_B:
            ys.append(r.value)
    pooled = sorted([(v, 0) for v in xs] + [(v, 1) for v in ys])
    vals = [p[0] for p in pooled]
    # pooled mid-ranks (1-based)
    from collections import Counter

    cnt = Counter(vals)
    first_at: dict = {}
    seen = 0
    for v in sorted(cnt):
        first_at[v] = seen + 1
        seen += cnt[v]
    midrank = {v: first_at[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    rx = sorted(midrank[v] for v in xs)
    ry = sorted(midrank[v] for v in ys)
    n, m = len(xs), len(ys)
    u = n * sum((r - (i + 1)) ** 2 for i, r in enumerate(rx)) + m * sum(
        (s - (j + 1)) ** 2 for j, s in enumerate(ry)
    )
    big = n + m
    t_ref = u / (n * m * big) - (4 * m * n - 1) / (6 * big)
    row = REGISTRY["stat_cvm_2samp"].fn(spark, sf_dir).collect()[0]
    assert (row.n_a, row.n_b) == (n, m)
    assert math.isclose(row.t_stat, round(t_ref, 6), abs_tol=2e-6)


def test_changepoint_matches_brute_force(spark, sf_dir):
    """Every split cost evaluated directly from collected daily sums
    (mean-centered SS per segment) must pick the same argmax."""
    days = sorted(
        (r.day, r.x)
        for r in load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("x"))
        .collect()
    )
    xs = [x for _d, x in days]
    n = len(xs)

    def ss(seg):
        m = sum(seg) / len(seg)
        return sum((v - m) ** 2 for v in seg)

    sst = ss(xs)
    best = max(
        ((sst - ss(xs[:k]) - ss(xs[k:]), -k) for k in range(1, n)),
    )
    red, k = best[0], -best[1]
    row = REGISTRY["ts_changepoint"].fn(spark, sf_dir).collect()[0]
    assert row.n_left == k and row.n_right == n - k
    assert row.split_day == days[k - 1][0].strftime("%Y-%m-%d")
    assert math.isclose(row.ss_reduction, round(red, 6), abs_tol=1e-3)
    assert math.isclose(
        row.mean_left, round(sum(xs[:k]) / k, 6), abs_tol=2e-6
    )


def test_isotonic_calibration_pava_properties(spark, sf_dir):
    """Calibrated rates must be (a) non-decreasing in bin order,
    (b) pool-mean-preserving (each constant segment's value equals the
    weighted mean of its raw bins), and (c) equal to a brute-force
    O(n^2) PAVA on the same (n, raw) inputs."""
    rows = sorted(
        REGISTRY["ml_isotonic_calibration"].fn(spark, sf_dir).collect(),
        key=lambda r: r.bin_id,
    )
    cal = [r.calibrated for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(cal, cal[1:]))
    # reconstruct pools as maximal constant runs; check weighted means
    i = 0
    while i < len(rows):
        j = i
        while j + 1 < len(rows) and rows[j + 1].calibrated == rows[i].calibrated:
            j += 1
        seg = rows[i : j + 1]
        # exact integer pool mean (pos recovered from the 6-dp rate —
        # exact while n < 1e6, see below); calibrated is rounded 6dp
        wmean = sum(int(round(r.raw_rate * r.n)) for r in seg) / sum(
            r.n for r in seg
        )
        assert math.isclose(
            rows[i].calibrated, wmean, abs_tol=5.1e-7
        ), (i, j, rows[i].calibrated, wmean)
        i = j + 1
    # brute-force PAVA must pool on the EXACT (pos, n) integers the
    # query pools on, not the 6-dp raw_rate (near-tie bins could
    # legitimately diverge otherwise — r15 ADVICE fix).  pos is
    # recovered exactly from the rounded rate while n < 1e6: the
    # rounding error bound 5e-7 * n stays below 0.5.
    n = [r.n for r in rows]
    assert all(x < 1_000_000 for x in n)
    pos = [int(round(r.raw_rate * r.n)) for r in rows]
    v = [p / x for p, x in zip(pos, n)]
    w = list(n)
    vals = list(v)
    blocks = [[i, i] for i in range(len(v))]
    changed = True
    while changed:
        changed = False
        for k in range(len(vals) - 1):
            if vals[k] > vals[k + 1] + 1e-15:
                tot = w[k] + w[k + 1]
                merged = (vals[k] * w[k] + vals[k + 1] * w[k + 1]) / tot
                vals[k : k + 2] = [merged]
                w[k : k + 2] = [tot]
                blocks[k : k + 2] = [[blocks[k][0], blocks[k + 1][1]]]
                changed = True
                break
    expect = {}
    for (s, e), val in zip(blocks, vals):
        for b in range(s, e + 1):
            expect[rows[b].bin_id] = val
    for r in rows:
        assert math.isclose(r.calibrated, expect[r.bin_id], abs_tol=5.1e-7)


def test_hodges_lehmann_matches_brute_force(spark, sf_dir):
    """HL from an explicit O(n^2) Walsh-average enumeration of the
    collected daily sums."""
    days = [
        r.x
        for r in load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("x"))
        .collect()
    ]
    walsh = sorted(
        (a + b) / 2.0
        for i, a in enumerate(days)
        for b in days[i:]
    )
    m = len(walsh)
    hl = (
        walsh[m // 2]
        if m % 2
        else (walsh[m // 2 - 1] + walsh[m // 2]) / 2.0
    )
    row = REGISTRY["stat_hodges_lehmann"].fn(spark, sf_dir).collect()[0]
    assert row.n_days == len(days)
    assert row.n_pairs == len(days) * (len(days) + 1) // 2
    assert math.isclose(row.hl_estimate, round(hl, 6), abs_tol=2e-6)


def test_fleiss_kappa_hand_cases(spark, tmp_path):
    """Fleiss 1971 worked cases on a synthetic lineitem shape: perfect
    agreement -> kappa 1; a hand-computed mixed table matches the exact
    rational formula; subjects with the wrong rater count are excluded."""
    import math

    from pasardassist_spark.queries.matching import stat_fleiss_kappa

    rows = []
    # 3 subjects with 4 raters: (AAAA), (AANN), (RRRR); plus one 3-rater
    # subject that must be EXCLUDED
    for ok, flags in ((1, "AAAA"), (2, "AANN"), (3, "RRRR"), (4, "AAA")):
        rows += [(ok, f) for f in flags]
    df = spark.createDataFrame(rows, "l_orderkey long, l_returnflag string")
    df.write.parquet(str(tmp_path / "lineitem.parquet"))
    got = stat_fleiss_kappa(spark, str(tmp_path)).first()
    assert (got.n_subjects, got.n_raters) == (3, 4)
    # A = 16 + (4+4) + 16 = 40; N=3, n=4; G = (A:6, N:2, R:4), B = 56
    a_, n_, nsub = 40, 4, 3
    b_ = 6 * 6 + 2 * 2 + 4 * 4
    p_bar = (a_ - nsub * n_) / (nsub * n_ * (n_ - 1))
    p_bar_e = b_ / (nsub * n_) ** 2
    kappa = (p_bar - p_bar_e) / (1 - p_bar_e)
    assert math.isclose(got.p_bar, round(p_bar, 6))
    assert math.isclose(got.p_bar_e, round(p_bar_e, 6))
    assert math.isclose(got.kappa, round(kappa, 6))
    # perfect agreement: every subject unanimous -> kappa == 1
    uni = spark.createDataFrame(
        [(ok, f) for ok, fl in ((1, "AAAA"), (2, "NNNN"), (3, "RRRR"))
         for f in fl],
        "l_orderkey long, l_returnflag string",
    )
    (tmp_path / "uni").mkdir()
    uni.write.parquet(str(tmp_path / "uni" / "lineitem.parquet"))
    assert stat_fleiss_kappa(spark, str(tmp_path / "uni")).first().kappa == 1.0
