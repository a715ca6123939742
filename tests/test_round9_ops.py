"""Round-9 operator tests: boilerplate stripping, containment pairs,
Mann-Whitney U, nearest-asof join."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F


# ------------------------------------------------- boilerplate_strip


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_boilerplate_removed_everywhere_including_first(spark):
    from pasardassist_spark.operators.dedup import boilerplate_strip

    bp = "b " * 9 + "b"  # one full 10-token passage
    uniq = ["u%d x y z q w e r t y" % i for i in range(4)]
    # boilerplate passage leads 3 docs (df=3 >= max_df); doc 3 is clean
    d = _docs(
        spark,
        [(0, f"{bp} {uniq[0]}"), (1, f"{bp} {uniq[1]}"),
         (2, f"{bp} {uniq[2]}"), (3, uniq[3])],
    )
    out = {
        r.doc_id: r
        for r in boilerplate_strip(d, "text", "doc_id", max_df=3).collect()
    }
    for i in range(3):
        assert out[i].clean_text == uniq[i]
        assert out[i].n_dropped == 1 and out[i].n_kept == 1
    assert out[3].clean_text == uniq[3] and out[3].n_dropped == 0


def test_boilerplate_low_df_duplicates_survive(spark):
    """df=2 < max_df=3: a passage shared by two docs is NOT boilerplate
    (that's passage_dedup's job); both copies survive."""
    from pasardassist_spark.operators.dedup import boilerplate_strip

    p = " ".join(f"w{i}" for i in range(10))
    d = _docs(spark, [(0, p), (1, p)])
    out = boilerplate_strip(d, "text", "doc_id", max_df=3).collect()
    assert all(r.clean_text == p and r.n_dropped == 0 for r in out)


def test_boilerplate_fully_stripped_doc_survives_empty(spark):
    from pasardassist_spark.operators.dedup import boilerplate_strip

    p = " ".join(f"w{i}" for i in range(10))
    d = _docs(spark, [(0, p), (1, p), (2, p)])
    out = {r.doc_id: r for r in
           boilerplate_strip(d, "text", "doc_id", max_df=3).collect()}
    assert len(out) == 3
    assert all(r.clean_text == "" and r.n_kept == 0 for r in out.values())


# ------------------------------------------------- containment_pairs


def test_containment_catches_subset_jaccard_misses(spark):
    from pasardassist_spark.operators.dedup import containment_pairs

    short = " ".join(f"s{i}" for i in range(8))  # 4 distinct 5-shingles
    long_ = short + " " + " ".join(f"l{i}" for i in range(40))
    d = _docs(spark, [(0, short), (1, long_)])
    out = {(r.src_id, r.dst_id): r
           for r in containment_pairs(d, "text", "doc_id", 0.9).collect()}
    # short is fully contained in long (its shingles all reappear)
    assert (0, 1) in out and out[(0, 1)].containment == 1.0
    # long is NOT contained in short (only 4 of its 44 shingles shared)
    assert (1, 0) not in out
    # and Jaccard on the same pair is tiny: 4/(4+44-4) < 0.1
    assert out[(0, 1)].n_shared / (4 + 44 - 4) < 0.1


def test_containment_df1_prune_is_lossless(spark):
    """Implementation (df>=2 prune) == brute force on a mixed fixture."""
    from pasardassist_spark.operators.dedup import containment_pairs, shingles

    texts = [
        " ".join(f"a{i}" for i in range(12)),
        " ".join(f"a{i}" for i in range(9)) + " z1 z2 z3",
        " ".join(f"b{i}" for i in range(15)),
        " ".join(f"a{i}" for i in range(6)) + " "
        + " ".join(f"b{i}" for i in range(6)),
    ]
    d = _docs(spark, list(enumerate(texts)))
    got = {
        (r.src_id, r.dst_id, r.n_shared, r.containment)
        for r in containment_pairs(d, "text", "doc_id", 0.3).collect()
    }
    # brute force in Python
    sh = {}
    for r in shingles(d, "text", "doc_id").collect():
        sh.setdefault(r.doc_id, set()).add(r.shingle)
    want = set()
    for a in sh:
        for b in sh:
            if a == b:
                continue
            inter = len(sh[a] & sh[b])
            c = inter / len(sh[a])
            if c >= 0.3:
                want.add((a, b, inter, round(c, 6)))
    assert got == want


# ------------------------------------------------- mannwhitney_u


def test_mannwhitney_known_case(spark):
    """Hand-computed example with ties: A=[1,2,2,5], B=[2,3,4].
    Ranks: 1->1; three 2s -> avg 3; 3->5; 4->6; 5->7.
    R_A = 1+3+3+7 = 14, U_A = 14 - 4*5/2 = 4; mean = 6.
    ties: one group of 3 -> T = 24; N=7.
    var = 12/12 * (8 - 24/42) = 7.428571...; z = (4-6)/sqrt(var)."""
    from pasardassist_spark.operators.drift import mannwhitney_u

    a = [1.0, 2.0, 2.0, 5.0]
    b = [2.0, 3.0, 4.0]
    rows = [Row(value=v, g="a") for v in a] + [Row(value=v, g="b") for v in b]
    counts = (
        spark.createDataFrame(rows)
        .groupBy("value")
        .agg(
            F.sum((F.col("g") == "a").cast("long")).alias("cnt_a"),
            F.sum((F.col("g") == "b").cast("long")).alias("cnt_b"),
        )
    )
    r = mannwhitney_u(counts).collect()[0]
    assert (r.n_a, r.n_b) == (4, 3)
    assert r.u_stat == 4.0
    import math

    var = (4 * 3 / 12) * ((7 + 1) - 24 / (7 * 6))
    assert abs(r.z - round((4 - 6) / math.sqrt(var), 6)) < 1e-12
    assert not r.significant


def test_mannwhitney_extreme_separation_significant(spark):
    from pasardassist_spark.operators.drift import mannwhitney_u

    rows = [Row(value=float(v), g="a") for v in range(20)] + [
        Row(value=float(v + 100), g="b") for v in range(20)
    ]
    counts = (
        spark.createDataFrame(rows)
        .groupBy("value")
        .agg(
            F.sum((F.col("g") == "a").cast("long")).alias("cnt_a"),
            F.sum((F.col("g") == "b").cast("long")).alias("cnt_b"),
        )
    )
    r = mannwhitney_u(counts).collect()[0]
    assert r.u_stat == 0.0  # complete separation
    assert r.significant and r.z < -5


# ------------------------------------------------- nearest-asof


def test_asof_nearest_directions_ties_tolerance(spark):
    from pasardassist_spark.operators.asof import asof_join_nearest_broadcast

    right = spark.createDataFrame(
        [Row(k="x", rts=100_000_000, v="r100"),
         Row(k="x", rts=200_000_000, v="r200")]
    )
    left = spark.createDataFrame(
        [
            Row(k="x", id=1, ts=110_000_000),   # nearer backward
            Row(k="x", id=2, ts=190_000_000),   # nearer forward
            Row(k="x", id=3, ts=150_000_000),   # exact tie -> earlier (r100)
            Row(k="x", id=4, ts=290_000_000),   # within tol of r200 only
            Row(k="x", id=5, ts=400_000_000),   # beyond tol -> null
            Row(k="y", id=6, ts=150_000_000),   # no key match -> null
        ]
    )
    out = {
        r.id: r
        for r in asof_join_nearest_broadcast(
            left, right, ["k"], "ts", "rts", ["v"],
            tolerance_us=100_000_000, delta_col="d",
            bucket_width_us=50_000_000,
        ).collect()
    }
    assert out[1].v == "r100" and out[1].d == 10_000_000
    assert out[2].v == "r200" and out[2].d == 10_000_000
    assert out[3].v == "r100" and out[3].d == 50_000_000
    assert out[4].v == "r200" and out[4].d == 90_000_000
    assert out[5].v is None and out[5].d is None
    assert out[6].v is None


def test_asof_nearest_matches_naive(spark, sf_dir):
    """Differential: broadcast nearest == a naive per-row nearest scan on
    real events at sf0.001."""
    from pasardassist_spark.operators.asof import asof_join_nearest_broadcast
    from pasardassist_spark.tables import load

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    rates = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("rts"))
        .agg(F.count(F.lit(1)).alias("day_n"))
    )
    tol = 72_000_000_000
    got = {
        r.event_id: (r.day_n, r.d)
        for r in asof_join_nearest_broadcast(
            ev, rates, ["event_type"], "ts", "rts", ["day_n"],
            tol, delta_col="d",
        ).collect()
    }
    rate_rows = {}
    for r in rates.collect():
        rate_rows.setdefault(r.event_type, []).append(r)
    import datetime as dt

    def us(t):
        return int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    for e in ev.collect():
        best = None
        for r in sorted(rate_rows.get(e.event_type, []), key=lambda r: r.rts):
            d = abs(us(e.ts) - us(r.rts))
            if d <= tol and (best is None or d < best[1]):
                best = (r.day_n, d)
        assert got[e.event_id] == (best if best else (None, None)), e.event_id


# ------------------------------------------------- gopher rules


def test_gopher_each_rule_fails_independently(spark):
    from pasardassist_spark.queries.curation import (
        GOPHER_STOPS,
        curate_gopher_rules,
    )
    from pasardassist_spark.queries.registry import REGISTRY

    fn = REGISTRY["curate_gopher_rules"].fn
    base_words = ["the", "of"] + [f"word{i}" for i in range(55)]
    cases = {
        0: " ".join(base_words),                       # passes all rules
        1: " ".join(base_words[:10]),                  # too few words
        2: " ".join(["the", "of"] + ["ab"] * 60),      # mean word len < 3
        3: " ".join(["the", "of"] + ["#" * 5] * 60),   # symbols + non-alpha
        4: " ".join(["the", "of"] + ["12345"] * 60),   # alpha ratio < 0.8
        5: " ".join([f"word{i}" for i in range(60)]),  # no stopword hits
    }
    import pandas as pd

    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(cases), "text": list(cases.values())})
    )
    import pasardassist_spark.queries.curation as C

    orig = C.load
    try:
        C.load = lambda spark, sf_dir, name: sdf  # noqa: ARG005
        out = {r.doc_id: r for r in fn(spark, "ignored").collect()}
    finally:
        C.load = orig
    assert out[0].keep
    for i in range(1, 6):
        assert not out[i].keep, (i, out[i])
    assert out[5].stop_hits == 0 and out[0].stop_hits == 2
    assert set(GOPHER_STOPS) >= {"the", "of"}


# ------------------------------------------------- spearman


def test_spearman_perfect_and_inverse_and_hand_ties(spark):
    from pasardassist_spark.operators.drift import spearman_rho

    mono = spark.createDataFrame(
        [Row(x=i, y=float(i * i)) for i in range(1, 30)]
    )
    assert spearman_rho(mono, "x", "y").collect()[0].rho == 1.0
    inv = spark.createDataFrame(
        [Row(x=i, y=float(-3 * i + 100)) for i in range(1, 30)]
    )
    assert spearman_rho(inv, "x", "y").collect()[0].rho == -1.0
    # hand case with ties: x=[1,2,2,3], y=[10,20,20,5]
    # rx2 = [2,5,5,8]; ry2 = [4,13,13,... wait wrong — compute:
    # ranks x: 1->1, 2,2->2.5, 3->4  => x2: [2,5,5,8]
    # ranks y: 5->1, 10->2, 20,20->3.5 => y2 per row: [4,7,7,2]
    # n=4, sum(rx2*ry2)=8+35+35+16=94; sum(rx2^2)=4+25+25+64=118
    # sum(ry2^2)=16+49+49+4=118; mean term = 4*25=100
    # rho = (94-100)/sqrt(18*18) = -6/18 = -0.333333
    ties = spark.createDataFrame(
        [Row(x=1, y=10.0), Row(x=2, y=20.0), Row(x=2, y=20.0), Row(x=3, y=5.0)]
    )
    r = spearman_rho(ties, "x", "y").collect()[0]
    assert (r.n, r.rho) == (4, -0.333333)


# ------------------------------------------------- triangle count


def test_triangle_count_hand_graph(spark):
    """Two triangles sharing edge (1,2) plus a pendant path: exactly 2."""
    from pasardassist_spark.operators.components import triangle_count

    edges = spark.createDataFrame(
        [Row(a=1, b=2), Row(a=1, b=3), Row(a=2, b=3),   # triangle 1-2-3
         Row(a=1, b=4), Row(a=2, b=4),                  # triangle 1-2-4
         Row(a=4, b=5), Row(a=5, b=6)]                  # path, no triangle
    )
    r = triangle_count(edges).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (6, 7, 2)


def test_triangle_count_matches_bruteforce_random(spark):
    import itertools
    import random

    from pasardassist_spark.operators.components import triangle_count

    rng = random.Random(99)
    nodes = list(range(40))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(150)}
    )
    eset = set(edges)
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    df = spark.createDataFrame([Row(a=a, b=b) for a, b in edges])
    r = triangle_count(df).collect()[0]
    assert r.n_triangles == want and r.n_edges == len(edges)


def test_triangle_count_skewed_hub(spark):
    """Star graph (hub + 30 leaves): zero triangles; add one leaf-leaf
    edge -> exactly one. Exercises the orientation path where the hub's
    degree dwarfs everything."""
    from pasardassist_spark.operators.components import triangle_count

    star = [Row(a=0, b=i) for i in range(1, 31)]
    assert triangle_count(
        spark.createDataFrame(star)
    ).collect()[0].n_triangles == 0
    assert triangle_count(
        spark.createDataFrame(star + [Row(a=7, b=8)])
    ).collect()[0].n_triangles == 1


# ------------------------------------------------- script lang-id


def test_lang_id_script_routes_planted_scripts(spark):
    from pasardassist_spark.operators.text import (
        predict_lang_script,
        tokens,
    )

    docs = {
        0: ("zh", "这是一个中文文档 机器学习 模型训练 数据"),
        1: ("ja", "これは日本語の文書です 機械学習"),       # kana + han -> ja
        2: ("ko", "이것은 한국어 문서입니다 기계 학습"),
        3: ("ru", "это русский документ машинное обучение"),
        4: ("ar", "هذه وثيقة عربية تعلم الآلة"),
        5: ("el", "αυτό είναι ελληνικό έγγραφο μάθηση"),
        6: ("hi", "यह एक हिंदी दस्तावेज़ है मशीन लर्निंग"),
        7: ("en", "the quick brown fox and the lazy dog of doom is here"),
        8: ("de", "der hund und die katze das ist gut und der rest"),
        # latin text with a couple of stray CJK chars: share < thresholds,
        # must fall back to the marker path, not misroute
        9: ("en", "the cat 中 and the dog 文 of the house is here"),
    }
    df = spark.createDataFrame(
        [Row(doc_id=k, text=v[1]) for k, v in docs.items()]
    )
    out = {
        r.doc_id: r.p
        for r in df.select(
            "doc_id",
            predict_lang_script(F.col("text"), tokens(F.col("text"))).alias("p"),
        ).collect()
    }
    for k, (want, _t) in docs.items():
        assert out[k] == want, (k, out[k], want)


# --------------------------------------- round-10 degenerate-input guards


def _mw_counts(spark, rows):
    return spark.createDataFrame(
        [Row(value=v, cnt_a=a, cnt_b=b) for v, a, b in rows]
    )


def test_mannwhitney_all_tied_zero_variance_defined(spark):
    """Every observation tied at one value: tie-corrected variance is
    exactly 0; z must be a defined 0.0 (not NaN) and significant false."""
    from pasardassist_spark.operators.drift import mannwhitney_u

    r = mannwhitney_u(_mw_counts(spark, [(1.0, 5, 5)])).collect()[0]
    assert (r.n_a, r.n_b) == (5, 5)
    assert r.z == 0.0 and r.z == r.z  # defined, not NaN
    assert r.significant is False


def test_mannwhitney_empty_sample_zero_variance_defined(spark):
    from pasardassist_spark.operators.drift import mannwhitney_u

    r = mannwhitney_u(
        _mw_counts(spark, [(1.0, 3, 0), (2.0, 2, 0)])
    ).collect()[0]
    assert (r.n_a, r.n_b) == (5, 0)
    assert r.z == 0.0 and r.significant is False


def test_mannwhitney_int64_overflow_raises_loudly(spark):
    """Past the exact-int64 tie bound the operator must FAIL, not wrap.
    Under ANSI (the Spark 4 default) an actual t^3 overflow already
    raises in the agg; this case sits just INSIDE actual-overflow
    territory but past the conservative bound (max_t^2 * N >= 9e18),
    so it exercises the guard itself — the one that also protects a
    non-ANSI deployment where the arithmetic would wrap silently."""
    import pytest

    from pasardassist_spark.operators.drift import mannwhitney_u

    # max_t = 2e6 -> t^3 = 8e18 < 2^63 (no per-row ANSI overflow);
    # N = 2.25e6 -> max_t^2 * N = 9e18 trips the guard at the edge.
    big = _mw_counts(spark, [(1.0, 2_000_000, 0), (2.0, 0, 250_000)])
    with pytest.raises(Exception, match="exact-int64"):
        mannwhitney_u(big).collect()


def test_mannwhitney_actual_overflow_raises_under_ansi(spark):
    """A genuinely overflowing tie term (t = 3e9 -> t^3 ~ 2.7e28) must
    also fail loudly — either the guard or ANSI overflow, never a wrap."""
    import pytest

    from pasardassist_spark.operators.drift import mannwhitney_u

    big = _mw_counts(spark, [(1.0, 3_000_000_000, 3_000_000_000)])
    with pytest.raises(Exception, match="exact-int64|ARITHMETIC_OVERFLOW"):
        mannwhitney_u(big).collect()


def test_spearman_constant_axis_null_not_nan(spark):
    from pasardassist_spark.operators.drift import spearman_rho

    const = spark.createDataFrame(
        [Row(x=1, y=float(i)) for i in range(10)]
    )
    r = spearman_rho(const, "x", "y").collect()[0]
    assert r.n == 10 and r.rho is None


def test_spearman_over_n_bound_raises_loudly(spark):
    import pytest

    from pasardassist_spark.operators.drift import SPEARMAN_MAX_N, spearman_rho

    big = spark.range(SPEARMAN_MAX_N + 1).select(
        F.col("id").alias("x"), (F.col("id") * 2).alias("y")
    )
    with pytest.raises(Exception, match="exact-int64"):
        spearman_rho(big, "x", "y").collect()


# ------------------------------------------- exact-substring dedup (r10)


def _brute_exact_substr(docs, k):
    """Offset-level brute force: mark every position whose k-gram (as a
    token tuple, no hashing) occurs >= 2 times anywhere in the corpus."""
    from collections import Counter

    toks = {d: t.split() for d, t in docs}
    grams = Counter()
    for t in toks.values():
        for i in range(len(t) - k + 1):
            grams[tuple(t[i : i + k])] += 1
    out = {}
    for d, t in toks.items():
        covered = [False] * len(t)
        for i in range(len(t) - k + 1):
            if grams[tuple(t[i : i + k])] >= 2:
                for j in range(i, i + k):
                    covered[j] = True
        kept = [tok for tok, c in zip(t, covered) if not c]
        out[d] = (" ".join(kept), len(t), sum(covered))
    return out


def test_exact_substring_matches_bruteforce_planted(spark):
    """Planted corpus: a 25-token block shared by every third doc at
    random offsets, plus one doc containing it twice (within-doc dup).
    The distributed gram-chain coverage must equal offset-level brute
    force exactly — including untouched docs passing through verbatim."""
    import random

    from pasardassist_spark.operators.dedup import exact_substring_dedup

    rng = random.Random(7)
    shared = ["s%d" % i for i in range(25)]
    docs = []
    for d in range(30):
        words = ["d%d_%d" % (d, i) for i in range(rng.randint(5, 40))]
        if d % 3 == 0:
            off = rng.randint(0, len(words))
            words = words[:off] + shared + words[off:]
        docs.append((d, " ".join(words)))
    docs.append(
        (99, " ".join(["x%d" % i for i in range(5)] + shared + ["y"] + shared))
    )

    k = 10
    want = _brute_exact_substr(docs, k)
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs]
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in exact_substring_dedup(df, "text", "doc_id", k).collect()
    }
    assert got == want


def test_exact_substring_removes_all_copies_and_spares_short(spark):
    from pasardassist_spark.operators.dedup import exact_substring_dedup

    block = " ".join("b%d" % i for i in range(10))
    docs = [
        Row(doc_id=0, text=f"u0 {block} v0"),
        Row(doc_id=1, text=f"u1 u1b {block}"),
        Row(doc_id=2, text="only nine tokens here not enough for a gram x"),
    ]
    out = {
        r.doc_id: r
        for r in exact_substring_dedup(
            spark.createDataFrame(docs), "text", "doc_id", 10
        ).collect()
    }
    # ALL copies removed (Lee et al. policy), not all-but-one
    assert out[0].clean_text == "u0 v0" and out[0].n_removed == 10
    assert out[1].clean_text == "u1 u1b" and out[1].n_removed == 10
    # doc shorter than the window is untouched (and returns original text)
    assert out[2].n_removed == 0 and out[2].clean_text == docs[2].text


# ------------------------------------------------------- WARC source (r10)


def test_warc_record_framing_is_content_length_driven():
    """A payload containing 'WARC/1.0\\r\\n\\r\\n' bytes must NOT
    desynchronize the parser — framing comes from Content-Length alone."""
    from pasardassist_spark.sources.warc import decode_records, encode_record

    evil = "prefix WARC/1.0\r\n\r\nContent-Length: 0\r\n\r\n suffix"
    blob = (
        encode_record("a", evil.encode("utf-8"), target_uri="u://1")
        + encode_record("b", b"plain")
    )
    recs = list(decode_records(blob))
    assert [r["record_id"] for r in recs] == ["a", "b"]
    assert recs[0]["payload"] == evil
    assert recs[0]["target_uri"] == "u://1"
    assert recs[1]["target_uri"] is None
    assert recs[1]["content_length"] == 5


def test_warc_malformed_inputs_fail_loudly():
    from pasardassist_spark.sources.warc import decode_records, encode_record

    with pytest.raises(ValueError, match="bad version"):
        list(decode_records(b"HTTP/1.1 200\r\n\r\n"))
    ok = encode_record("a", b"xyz")
    with pytest.raises(ValueError, match="truncated"):
        list(decode_records(ok[:-6]))  # cut into the payload
    no_len = b"WARC/1.0\r\nWARC-Type: resource\r\n\r\n\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        list(decode_records(no_len))


def test_warc_write_read_distributed_roundtrip(spark, tmp_path):
    """Multi-shard roundtrip: rows survive byte-identically, shard files
    match the manifest, empty partitions leave no shards behind."""
    import os

    from pasardassist_spark.sources.warc import read_warc, write_warc

    rows = [
        Row(record_id=str(i), payload=f"doc {i} body\u00e9 {'x' * i}")
        for i in range(37)
    ]
    df = spark.createDataFrame(rows).repartition(6, "record_id")
    path = str(tmp_path / "warc_out")
    manifest = write_warc(df, path).collect()
    assert sum(m.n_records for m in manifest) == 37
    files = sorted(os.listdir(path))
    assert files == sorted(os.path.basename(m.file) for m in manifest)
    got = {
        r.record_id: r.payload
        for r in read_warc(spark, path).collect()
    }
    assert got == {r.record_id: r.payload for r in rows}


# ------------------------------------------------ DOULION triangles (r10)


def test_doulion_estimate_quality_on_planted_graph(spark):
    """K40 clique (9880 triangles) plus a triangle-free star: the p=0.5
    deterministic-gate estimate must land within 25% of exact, and the
    p^3 scale-up must be exact integer arithmetic. The md5 gate is fixed,
    so this is a deterministic regression pin, not a flaky sample."""
    from pasardassist_spark.operators.components import (
        triangle_count,
        triangle_count_doulion,
    )

    clique = [(i, j) for i in range(40) for j in range(i + 1, 40)]
    star = [(100, 100 + i) for i in range(1, 30)]
    edges = spark.createDataFrame(clique + star, ["a", "b"])
    exact = triangle_count(edges).collect()[0].n_triangles
    assert exact == 9880
    est = triangle_count_doulion(edges, 5000).collect()[0]
    assert est.n_edges == len(clique) + len(star)
    assert est.est_triangles == est.n_triangles_sampled * 8
    assert abs(est.est_triangles - exact) / exact < 0.25


def test_doulion_rejects_non_divisor_rate(spark):
    import pytest as _pytest

    from pasardassist_spark.operators.components import triangle_count_doulion

    edges = spark.createDataFrame([(1, 2)], ["a", "b"])
    with _pytest.raises(ValueError, match="divide 10000"):
        triangle_count_doulion(edges, 3333)


# -------------------------------------------------- UniMax weights (r10)


def test_unimax_allocation_all_regimes(spark):
    """Waterfilling vs hand-solved allocations in the three regimes:
    budget below the uniform level (nobody capped), mixed (small source
    capped, rest share), and budget over total capacity (all capped,
    budget under-used)."""
    from pasardassist_spark.operators.mixing import unimax_allocation

    sizes = spark.createDataFrame(
        [("a", 10), ("b", 40), ("c", 50)], ["source", "n_tokens"]
    )
    # caps (C=2): a=20 b=80 c=100
    # regime 1: B=30 -> t=10, nobody capped; alloc 10 each
    r1 = {r.source: r for r in unimax_allocation(sizes, 30, 2).collect()}
    assert all(r1[k].alloc == 10.0 for k in "abc")
    assert r1["a"].epochs == 1.0 and r1["c"].epochs == 0.2
    # regime 2: B=100 -> a capped at 20, t=(100-20)/2=40 for b,c
    r2 = {r.source: r for r in unimax_allocation(sizes, 100, 2).collect()}
    assert r2["a"].alloc == 20.0 and r2["b"].alloc == 40.0 and r2["c"].alloc == 40.0
    assert r2["a"].epochs == 2.0
    # regime 3: B=500 > total capacity 200 -> everyone fully capped
    r3 = {r.source: r for r in unimax_allocation(sizes, 500, 2).collect()}
    assert [r3[k].alloc for k in "abc"] == [20.0, 80.0, 100.0]
    assert all(r3[k].epochs == 2.0 for k in "abc")
    # boundary: B exactly at a cap edge (B=60 -> t=20=cap(a): a exactly
    # capped, b,c at 20); tie between "a capped" and "a at level" segments
    r4 = {r.source: r for r in unimax_allocation(sizes, 60, 2).collect()}
    assert all(r4[k].alloc == 20.0 for k in "abc")


# ---------------------------------------------------- TFRecord sink (r10)


def test_crc32c_known_answer_vectors():
    """RFC 3720 / public test vectors for CRC32C (Castagnoli)."""
    from pasardassist_spark.sources.tfrecord import crc32c

    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_tfrecord_example_encode_decode_all_types():
    from pasardassist_spark.sources.tfrecord import (
        decode_example,
        decode_records,
        encode_example,
        encode_record,
    )

    feats = {
        "text": "héllo world",
        "doc_id": 42,
        "neg": -7,
        "emb": [1.5, -2.25, 0.0],
        "raw": b"\x00\x01\xff",
    }
    ex = encode_example(feats)
    got = decode_example(ex)
    assert got["text"] == "héllo world".encode("utf-8")
    assert got["doc_id"] == 42
    assert got["neg"] == -7  # negative int64 -> 10-byte varint path
    assert got["emb"] == [1.5, -2.25, 0.0]
    assert got["raw"] == b"\x00\x01\xff"
    # framing: two records back-to-back, CRC-verified
    blob = encode_record(ex) + encode_record(b"x")
    assert list(decode_records(blob))[0] == ex


def test_tfrecord_corruption_fails_loudly():
    from pasardassist_spark.sources.tfrecord import decode_records, encode_record

    rec = bytearray(encode_record(b"payload-bytes"))
    rec[15] ^= 0x01  # flip one payload bit
    with pytest.raises(ValueError, match="payload CRC"):
        list(decode_records(bytes(rec)))
    rec2 = bytearray(encode_record(b"payload-bytes"))
    rec2[3] ^= 0x01  # corrupt the length header
    with pytest.raises(ValueError, match="header CRC|truncated"):
        list(decode_records(bytes(rec2)))


def test_tfrecord_spark_roundtrip(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from pasardassist_spark.sources.tfrecord import read_tfrecord, write_tfrecord

    rows = [Row(doc_id=i, text=f"doc {i} é", n=i * 3) for i in range(23)]
    df = spark.createDataFrame(rows).repartition(4, "doc_id")
    path = str(tmp_path / "tfr")
    manifest = write_tfrecord(df, path).collect()
    assert sum(m.n_records for m in manifest) == 23
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("n", LongType()),
        ]
    )
    got = sorted(
        read_tfrecord(spark, path, schema).collect(), key=lambda r: r.doc_id
    )
    assert [(r.doc_id, r.text, r.n) for r in got] == [
        (r.doc_id, r.text, r.n) for r in rows
    ]


def test_tfrecord_roundtrip_narrow_integral_widths(spark, tmp_path):
    """ADVICE r10 asymmetry: the writer accepted int/smallint/tinyint
    (all stored as Int64List) but the reader only handled LongType, so
    a narrow-int schema wrote fine and crashed on read. The type
    surface must be symmetric."""
    from pasardassist_spark.sources.tfrecord import read_tfrecord, write_tfrecord

    df = spark.sql(
        "SELECT id AS doc_id, CAST(id * 2 AS INT) AS i32, "
        "CAST(id AS SMALLINT) AS i16, CAST(id AS TINYINT) AS i8 "
        "FROM range(9)"
    ).repartition(2)
    path = str(tmp_path / "tfr_narrow")
    write_tfrecord(df, path).collect()
    got = sorted(
        read_tfrecord(spark, path, df.schema).collect(), key=lambda r: r.doc_id
    )
    assert [(r.doc_id, r.i32, r.i16, r.i8) for r in got] == [
        (i, i * 2, i, i) for i in range(9)
    ]
    assert read_tfrecord(spark, path, df.schema).schema == df.schema


# --------------------------------------------------- SPFHP packing (r10)


def _ref_pack(rows, budget, max_depth):
    """Pure-Python end-to-end reference: same histogram greedy + same
    rank-block layout, computed with plain dicts and sorts."""
    from pasardassist_spark.operators.binpack import (
        _layout_blocks,
        spfhp_strategies,
    )

    ok = [(i, l) for i, l in rows if l <= budget]
    hist = {}
    for _, l in ok:
        hist[l] = hist.get(l, 0) + 1
    blocks, n_packs = _layout_blocks(
        spfhp_strategies(sorted(hist.items()), budget, max_depth)
    )
    rank = {}
    out = {}
    for i, l in sorted(ok, key=lambda t: (t[1], t[0])):
        r = rank.get(l, 0)
        rank[l] = r + 1
        for bl, s, e, off, mu in blocks:
            if bl == l and s <= r < e:
                out[i] = (l, off + (r - s) // mu, False)
                break
    for k, (i, l) in enumerate(sorted((i, l) for i, l in rows if l > budget)):
        out[i] = (l, n_packs + k, True)
    return out


def test_spfhp_strategies_validity_and_quality():
    from pasardassist_spark.operators.binpack import spfhp_strategies

    hist = [(100, 7), (200, 5), (300, 3), (512, 2), (50, 11), (1, 9)]
    strategies = spfhp_strategies(hist, 512, 16)
    # every strategy within budget; counts conserve the histogram
    got = {}
    for lengths, count in strategies:
        assert sum(lengths) <= 512
        for l in lengths:
            got[l] = got.get(l, 0) + count
    assert got == dict(hist)
    # efficiency: SPFHP on this mix must beat one-doc-per-pack by far
    n_packs = sum(c for _, c in strategies)
    total = sum(l * c for l, c in hist)  # LP lower bound: 9 packs
    assert n_packs <= 11  # one-doc-per-pack would be 37
    assert total / (n_packs * 512) > 0.7
    with pytest.raises(ValueError, match="exceeds budget"):
        spfhp_strategies([(513, 1)], 512)


def test_pack_bfd_distributed_matches_reference(spark):
    import random

    from pasardassist_spark.operators.binpack import pack_bfd

    rng = random.Random(11)
    rows = [(i, rng.randint(1, 700)) for i in range(300)]  # some overflow
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(7)
    got = {
        r.doc_id: (r.n_tokens, r.pack_id, r.overflow)
        for r in pack_bfd(df, "doc_id", "n_tokens", 512, 8).collect()
    }
    want = _ref_pack(rows, 512, 8)
    assert got == want
    # validity: pack sums and depth
    packs = {}
    for _, (l, p, ov) in got.items():
        packs.setdefault((p, ov), []).append(l)
    for (p, ov), ls in packs.items():
        if not ov:
            assert sum(ls) <= 512 and len(ls) <= 8
        else:
            assert len(ls) == 1 and ls[0] > 512


def test_pack_bfd_query_validity(spark, sf_dir):
    """Per-assignment validity of the raw packing (the registered query
    is the oracle-gated audit aggregate since r18 — same input chain)."""
    from pasardassist_spark.operators.binpack import pack_bfd
    from pasardassist_spark.operators import text as X
    from pasardassist_spark.queries.curation import PACK_BUDGET
    from pasardassist_spark.tables import load

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        X.token_count(X.tokens(F.col("text"))).alias("n_tokens"),
    )
    out = pack_bfd(d, "doc_id", "n_tokens", PACK_BUDGET, max_depth=16)
    rows = out.collect()
    n_docs = len(rows)
    assert len({r.doc_id for r in rows}) == n_docs  # exactly once
    packs = {}
    for r in rows:
        packs.setdefault(r.pack_id, []).append(r.n_tokens)
    assert all(sum(v) <= 512 and len(v) <= 16 for v in packs.values())
    total = sum(r.n_tokens for r in rows)
    assert total / (len(packs) * 512) > 0.85  # depth-16 fill, margin


def test_warc_gz_member_split_and_roundtrip(spark, tmp_path):
    """Common Crawl layout: one gzip member per record. The splitter must
    recover member boundaries via streaming decompression, reject
    truncated members, and the Spark reader must sniff .warc.gz and
    plain .warc shards in the same directory."""
    import gzip as _gz

    from pasardassist_spark.sources.warc import (
        encode_record,
        read_warc,
        split_gzip_members,
        write_warc,
    )

    r1 = encode_record("a", b"first payload")
    r2 = encode_record("b", b"second")
    blob = _gz.compress(r1, mtime=0) + _gz.compress(r2, mtime=0)
    assert list(split_gzip_members(blob)) == [r1, r2]
    with pytest.raises(ValueError, match="truncated gzip"):
        list(split_gzip_members(blob[:-8]))

    rows = [Row(record_id=str(i), payload=f"doc {i}") for i in range(19)]
    df = spark.createDataFrame(rows).repartition(3, "record_id")
    path = str(tmp_path / "warc_gz")
    manifest = write_warc(df, path, compress=True).collect()
    assert all(m.file.endswith(".warc.gz") for m in manifest)
    # drop one extra PLAIN shard into the same directory: mixed read
    extra = encode_record("99", b"plain shard")
    with open(f"{path}/part-99999.warc", "wb") as fh:
        fh.write(extra)
    got = {r.record_id: r.payload for r in read_warc(spark, path).collect()}
    assert got["99"] == "plain shard"
    assert len(got) == 20
    assert got["7"] == "doc 7"
