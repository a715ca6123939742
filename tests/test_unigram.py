"""Unigram-LM tokenizer training (operators/unigram.py): EM correctness
pinned by its mathematical guarantees plus a distributed-vs-sequential
differential on the E-step core."""

from __future__ import annotations

import math
from itertools import combinations

import pytest

from pasardassist_spark.operators import unigram as U


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("the cat sat on the mat",),
        ("the cat ate the rat",),
        ("a cat and a rat sat",),
        ("mats and rats and cats",),
    ] * 3
    return spark.createDataFrame(rows, ["text"])


@pytest.fixture(scope="module")
def types_df(corpus):
    return U.word_types(corpus, "text").cache()


def test_word_types(types_df):
    got = {r.word: r.cnt for r in types_df.collect()}
    assert got["the"] == 12  # 4 occurrences x 3
    assert got["cat"] == 9
    assert got["mats"] == 3


def test_seed_contains_all_chars_and_frequent_substrings(types_df):
    probs = U.seed_vocab(types_df, n_seeds=50)
    chars = {c for r in types_df.collect() for c in r.word}
    assert chars <= set(probs)
    assert "at" in probs and "cat" in probs
    assert abs(sum(probs.values()) - 1.0) < 1e-9


def _seq_expected_counts(types, probs, max_len):
    """Independent sequential reference for the E-step."""
    acc: dict[str, float] = {}
    ll = 0.0
    for word, cnt in types:
        ec, l = U._lattice_counts(word, cnt, probs, max_len)
        ll += l
        for p, c in ec.items():
            acc[p] = acc.get(p, 0.0) + c
    return acc, ll


def test_estep_distributed_equals_sequential(types_df):
    probs = U.seed_vocab(types_df, n_seeds=40)
    rows = U.expected_counts(types_df, probs).collect()
    dist = {r.piece: r.c for r in rows if r.piece != U._LL_SENTINEL}
    dist_ll = sum(r.ll for r in rows if r.piece == U._LL_SENTINEL)
    types = [(r.word, r.cnt) for r in types_df.collect()]
    ref, ref_ll = _seq_expected_counts(types, probs, U.MAX_PIECE_LEN)
    assert set(dist) == set(ref)
    for p in ref:
        assert dist[p] == pytest.approx(ref[p], rel=1e-9)
    assert dist_ll == pytest.approx(ref_ll, rel=1e-9)


def test_expected_counts_conserve_total_mass(types_df):
    """Sum of expected piece counts == expected total pieces, which for a
    lattice model must lie between n_words and n_chars."""
    probs = U.seed_vocab(types_df, n_seeds=40)
    _, counts, _ = U.em_step(types_df, probs)
    total = sum(counts.values())
    agg = [(r.word, r.cnt) for r in types_df.collect()]
    n_words = sum(c for _, c in agg)
    n_chars = sum(len(w) * c for w, c in agg)
    assert n_words - 1e-6 <= total <= n_chars + 1e-6


def test_em_loglik_monotone(types_df):
    """EM's fundamental guarantee: corpus log-likelihood never decreases
    across EM steps over a fixed support."""
    probs = U.seed_vocab(types_df, n_seeds=40)
    lls = []
    for _ in range(4):
        probs, _, ll = U.em_step(types_df, probs)
        lls.append(ll)
    for a, b in zip(lls, lls[1:]):
        assert b >= a - 1e-9


def test_train_reaches_target_size_with_char_coverage(types_df):
    probs, history = U.train_unigram(
        types_df, vocab_size=24, n_seeds=60, shrink=0.7
    )
    assert len(probs) <= max(
        24, len({c for r in types_df.collect() for c in r.word})
    )
    chars = {c for r in types_df.collect() for c in r.word}
    assert chars <= set(probs)
    assert abs(sum(probs.values()) - 1.0) < 1e-9
    assert len(history) >= 2


def test_viterbi_optimal_vs_bruteforce(types_df):
    probs, _ = U.train_unigram(types_df, vocab_size=24, n_seeds=60)
    logp = {p: math.log(v) for p, v in probs.items()}

    def brute_best(word):
        n = len(word)
        best = -math.inf
        for k in range(n):  # choose split positions
            for cuts in combinations(range(1, n), k):
                bounds = [0, *cuts, n]
                pieces = [
                    word[a:b] for a, b in zip(bounds, bounds[1:])
                ]
                if all(p in logp for p in pieces):
                    best = max(best, sum(logp[p] for p in pieces))
        return best

    for r in types_df.collect():
        seg = U.viterbi_segment(r.word, logp)
        assert "".join(seg) == r.word
        score = sum(logp[p] for p in seg)
        assert score == pytest.approx(brute_best(r.word), rel=1e-9)


def test_encode_counts(spark, types_df, corpus):
    probs, _ = U.train_unigram(types_df, vocab_size=24, n_seeds=60)
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zzz unknown-glyphs the")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in U.unigram_encode(
        docs, "text", "doc_id", probs
    ).collect()}
    assert got[1].n_words == 3
    assert got[1].n_pieces >= 3
    assert got[1].n_unk_words == 0
    # 'zzz' and 'unknown-glyphs' contain chars absent from the corpus
    assert got[2].n_unk_words == 2


def test_vocab_table_deterministic_order(spark, types_df):
    probs, _ = U.train_unigram(types_df, vocab_size=24, n_seeds=60)
    t1 = U.vocab_table(spark, probs).collect()
    t2 = U.vocab_table(spark, probs).collect()
    assert t1 == t2
    ranks = [r.rank for r in t1]
    assert ranks == sorted(ranks)


def test_seed_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], schema="word STRING, cnt LONG")
    with pytest.raises(ValueError):
        U.seed_vocab(empty, n_seeds=10)


def test_train_terminates_when_vocab_smaller_than_charset(types_df):
    """The ADVICE r10 hang: prune_vocab always keeps every single char,
    so vocab_size below the char count can never be reached — training
    must stop at the char-set floor instead of looping EM forever."""
    chars = {c for r in types_df.collect() for c in r.word}
    assert len(chars) > 5  # the fixture exercises the guard
    probs, history = U.train_unigram(types_df, vocab_size=5, n_seeds=60)
    assert chars <= set(probs)  # floor = the char set (plus nothing else
    # survivable below it); the call RETURNING at all is the regression test
    assert len(probs) >= len(chars)
    assert abs(sum(probs.values()) - 1.0) < 1e-9
    assert len(history) >= 2
