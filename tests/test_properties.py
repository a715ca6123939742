"""Hypothesis property tests over generated inputs — invariants no example
fixture can pin down (SURVEY.md §5.3).

Each property runs few examples (Spark jobs are the cost), but every
example is adversarially generated: duplicate keys, ties, empty groups,
boundary timestamps.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=25
    )
)
@settings(**SETTINGS)
def test_exact_dedup_partitions_input(spark, texts):
    """Group sizes sum to the row count; exactly one canonical row per
    group; canonical id is the group min."""
    from pasardassist_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = exact_dedup(df, "text", "doc_id").collect()
    assert len(out) == len(texts)
    by_hash: dict[str, list] = {}
    for r in out:
        by_hash.setdefault(r.content_hash, []).append(r)
    for rows in by_hash.values():
        assert all(r.n_copies == len(rows) for r in rows)
        canon = [r for r in rows if r.is_canonical]
        assert len(canon) == 1
        assert canon[0].doc_id == min(r.doc_id for r in rows)


@given(
    n=st.integers(min_value=1, max_value=60),
    page_size=st.integers(min_value=1, max_value=15),
)
@settings(**SETTINGS)
def test_pagination_partitions_any_set(spark, n, page_size):
    """Pages are disjoint, cover the set, honor the total order, and
    count_and_page's total equals the set size on every page."""
    from pasardassist_spark.operators.pagination import count_and_page

    df = spark.createDataFrame([(i, i % 7) for i in range(n)], "id long, grp long")
    order = [F.desc("grp"), F.asc("id")]
    seen: list[int] = []
    page = 1
    while True:
        rows = count_and_page(df, order, page, page_size).collect()
        assert all(r.total == n for r in rows)
        seen.extend(r.id for r in rows)
        if len(rows) < page_size:
            break
        page += 1
    assert sorted(seen) == list(range(n))
    assert len(seen) == len(set(seen))


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=10**6),  # ts micros
            st.sampled_from(["click", "view", "signup", "purchase", "error"]),
            st.floats(min_value=0, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    ),
    split=st.integers(min_value=0, max_value=100),
)
@settings(**SETTINGS)
def test_entity_fold_merge_associativity(spark, events, split):
    """fold(all) == merge(fold(part1), fold(part2)) for ANY split — the
    invariant that makes streaming replay converge."""
    from pasardassist_spark.operators.fold import (
        fold_entity_state,
        merge_entity_states,
    )

    rows = [
        (i, u, ts, et, round(v, 2)) for i, (u, ts, et, v) in enumerate(events)
    ]
    schema = "event_id long, user_id long, us long, event_type string, value double"
    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_micros(F.col("us"))
    )
    cut = split % (len(rows) + 1)
    a = df.filter(F.col("event_id") < cut)
    b = df.filter(F.col("event_id") >= cut)
    full = fold_entity_state(df)
    if a.count() == 0 or b.count() == 0:
        merged = fold_entity_state(df)
    else:
        merged = merge_entity_states(fold_entity_state(a), fold_entity_state(b))
    canon = lambda d: sorted(map(str, d.select(*sorted(d.columns)).collect()))
    assert canon(full) == canon(merged)


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000)), min_size=1, max_size=40
    )
)
@settings(**SETTINGS)
def test_salted_latest_any_distribution(spark, vals):
    """Two-phase argmax equals window argmax on arbitrary key/ts data
    (duplicate timestamps broken by id: total order)."""
    from pasardassist_spark.operators.latest import latest_per_key
    from pasardassist_spark.operators.skew import salted_latest_per_key

    rows = [(i, k, ts) for i, (k, ts) in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, k long, ts long")
    want = latest_per_key(df, ["k"], [F.desc("ts"), F.desc("id")])
    got = salted_latest_per_key(df, ["k"], F.struct(F.col("ts"), F.col("id")), 3)
    canon = lambda d: sorted(map(str, d.select(*sorted(d.columns)).collect()))
    assert canon(want) == canon(got)


@given(
    toks=st.lists(
        st.sampled_from(["a", "b", "c", "dd", "e"]), min_size=1, max_size=40
    )
)
@settings(**SETTINGS)
def test_max_run_count_equals_mode_count(spark, toks):
    """The sorted-run scan must equal the true mode count for ANY multiset
    (the Counter reference is the independent implementation)."""
    from collections import Counter

    from pasardassist_spark.operators.text import max_run_count

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    (got,) = df.select(max_run_count(F.array_sort("toks")).alias("m")).first()
    assert got == Counter(toks).most_common(1)[0][1]


@given(
    words=st.lists(
        st.sampled_from(["alpha", "beta", "x9", "-", "."]), min_size=0, max_size=8
    ),
    n_email=st.integers(0, 3),
    n_ip=st.integers(0, 3),
    n_phone=st.integers(0, 3),
)
@settings(**SETTINGS)
def test_redact_pii_counts_planted(spark, words, n_email, n_ip, n_phone):
    """Planted PII is counted exactly and fully removed; the redacted text
    contains no residual match of any pattern."""
    import re as _re

    from pasardassist_spark.operators.text import PII_PATTERNS, redact_pii

    parts = list(words)
    parts += [f"u{i}@host{i}.example" for i in range(n_email)]
    parts += [f"10.0.{i}.{i + 1}" for i in range(n_ip)]
    parts += [f"555-{1000 + i}" for i in range(n_phone)]
    text = " ".join(parts)
    df = spark.createDataFrame([(text,)], "t string")
    red, counts = redact_pii(F.col("t"))
    row = df.select(
        red.alias("red"), *[c.alias(k) for k, c in counts.items()]
    ).first()
    assert (row.email, row.ip, row.phone) == (n_email, n_ip, n_phone), text
    for _, pat, _m in PII_PATTERNS:
        assert not _re.search(pat, row.red), (pat, row.red)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),   # key: duplicates likely
            st.integers(min_value=-20, max_value=20),   # value: any sign
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_exclusive_prefix_sum_duplicates_and_negatives(spark, rows):
    """Totality contract: duplicate keys all receive the same cum_before —
    the sum over STRICTLY smaller keys — and negative values flow through
    the two-phase sum exactly like a sequential scan would. Differential
    oracle is a pure-Python reference."""
    from pasardassist_spark.operators.packing import exclusive_prefix_sum

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "rid long, k long, v long"
    )
    got = {
        r.rid: r.cum_before
        for r in exclusive_prefix_sum(df, "k", "v", n_buckets=4).collect()
    }
    for i, (k, _) in enumerate(rows):
        want = sum(v2 for k2, v2 in rows if k2 < k)
        assert got[i] == want, (i, k, got[i], want)


@given(
    st.lists(
        st.tuples(st.integers(0, 4095), st.integers(0, 4095)),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=20, deadline=None)
def test_zorder_interleave_is_bijective(spark, pairs):
    """Morton interleave must be invertible for in-range inputs: decoding
    the odd/even bit planes of z recovers (a, b) exactly — i.e. the sort
    key loses no information and z-equal implies row-equal."""
    from pyspark.sql import functions as F

    from pasardassist_spark.operators.zorder import zorder_value

    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.withColumn(
        "z", zorder_value([F.col("a"), F.col("b")], bits=12)
    ).collect()
    for r in rows:
        a = b = 0
        for bit in range(12):
            a |= ((r.z >> (bit * 2)) & 1) << bit
            b |= ((r.z >> (bit * 2 + 1)) & 1) << bit
        assert (a, b) == (r.a, r.b), (r.z, a, b, r.a, r.b)


@given(
    rows=st.lists(
        st.tuples(
            # eighths: exact binary fractions, so duplicates and strict
            # ordering survive the float round-trip — the FRACTIONAL-key
            # case the exclusive form's RANGE(-1) frame cannot express
            st.integers(min_value=-400, max_value=400),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_inclusive_prefix_sum_fractional_keys(spark, rows):
    """Inclusive totality contract on DOUBLE keys: every row's cum_through
    equals the sequential sum over keys <= its own (duplicates share the
    full through-key total), including keys spaced closer than 1.0 —
    the gap that makes the exclusive RANGE(-1) form integer-only."""
    from pasardassist_spark.operators.packing import inclusive_prefix_sum

    data = [(i, k8 / 8.0, v, 1) for i, (k8, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "rid long, k double, v long, one long")
    # multi-column form: both running totals from ONE two-phase pass
    got = {
        r.rid: (r.cum_v, r.cum_n)
        for r in inclusive_prefix_sum(
            df, "k", ["v", "one"], out=["cum_v", "cum_n"], n_buckets=4
        ).collect()
    }
    for i, (k8, _) in enumerate(rows):
        want_v = sum(v2 for k2, v2 in rows if k2 <= k8)
        want_n = sum(1 for k2, _ in rows if k2 <= k8)
        assert got[i] == (want_v, want_n), (i, k8 / 8.0, got[i], want_v, want_n)


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=10),
        min_size=1,
        max_size=20,
    ),
    held_out=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(min_value=1, max_value=12),
)
@settings(**SETTINGS)
def test_bpe_encode_properties(spark, words, held_out, n_merges):
    """For ANY trained merge table: encode_word matches the independent
    min-rank-present reference on arbitrary (incl. unseen-char) words,
    concatenating the subwords reconstructs the word exactly, and
    encoding is deterministic."""
    from pasardassist_spark.operators.bpe import encode_word, train_bpe_merges
    from tests.test_operators import _bpe_encode_reference

    corpus = spark.createDataFrame([(w,) for w in words], "text string")
    merges = train_bpe_merges(corpus, "text", n_merges)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for w in words + held_out:
        got = encode_word(w, ranks)
        assert got == _bpe_encode_reference(w, merges), (w, merges)
        assert "".join(got) == w, "lossy encode"
        assert encode_word(w, ranks) == got
