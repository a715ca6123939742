"""WordPiece (operators/wordpiece.py): training-vs-sequential-reference
equality, ## continuation semantics, greedy longest-match encoding, and
the [UNK] whole-word fallback."""

from __future__ import annotations

import pytest

from pasardassist_spark.operators.wordpiece import (
    CONT,
    UNK,
    encode_word_wp,
    train_wordpiece,
    wordpiece_encode,
    wordpiece_vocab,
)

# ------------------------------------------------- sequential reference


def _seq_symbols(w: str) -> list[str]:
    return [w[0]] + [CONT + c for c in w[1:]]


def _seq_train(word_counts: dict[str, int], n_merges: int):
    """Pure-Python WordPiece trainer: score = n(ab)/(n(a)n(b)), ties on
    (score desc, left, right), merged symbol = left + right-sans-##."""
    types = [( _seq_symbols(w), c) for w, c in word_counts.items()]
    merges = []
    for _ in range(n_merges):
        pair_n: dict[tuple, int] = {}
        sym_n: dict[str, int] = {}
        for syms, c in types:
            for s in syms:
                sym_n[s] = sym_n.get(s, 0) + c
            for a, b in zip(syms, syms[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + c
        cands = [
            (n / (sym_n[a] * sym_n[b]), a, b, n)
            for (a, b), n in pair_n.items()
            if n >= 2
        ]
        if not cands:
            break
        score, a, b, n = sorted(cands, key=lambda t: (-t[0], t[1], t[2]))[0]
        merges.append((a, b, score))
        joined = a + (b[len(CONT):] if b.startswith(CONT) else b)
        new_types = []
        for syms, c in types:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = joined
                else:
                    out.append(s)
            new_types.append((out, c))
        types = new_types
    return merges


CORPUS_WORDS = {"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5}


def _corpus_df(spark):
    # each word repeated `count` times so Spark's corpus-grain counts
    # equal the reference's word_counts
    text = " ".join(w for w, c in CORPUS_WORDS.items() for _ in range(c))
    return spark.createDataFrame([(0, text)], ["doc_id", "text"])


def test_train_matches_sequential_reference(spark):
    df = _corpus_df(spark)
    got = train_wordpiece(df, "text", 6)
    want = _seq_train(CORPUS_WORDS, 6)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_score_prefers_exclusive_pairs_over_frequent_ones(spark):
    """The defining WordPiece property: 'gs' (5 occurrences, but g and s
    almost never apart from each other) must merge before 'un'
    (16 occurrences of each part everywhere) when scores say so —
    checked structurally: the first merge is the max-score pair in the
    sequential reference, which differs from the max-COUNT pair."""
    ref = _seq_train(CORPUS_WORDS, 1)
    counts: dict[tuple, int] = {}
    for w, c in CORPUS_WORDS.items():
        syms = _seq_symbols(w)
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + c
    max_count_pair = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[0][0]
    assert (ref[0][0], ref[0][1]) != max_count_pair


def test_vocab_layout_and_encode_roundtrip(spark):
    df = _corpus_df(spark)
    vocab, merges = wordpiece_vocab(df, "text", 8)
    assert vocab[0] == UNK
    # every merge product present exactly once, after the char block
    for a, b, _ in merges:
        joined = a + (b[len(CONT):] if b.startswith(CONT) else b)
        assert vocab.count(joined) == 1
    vset = set(vocab)
    # greedy encode of every training word reassembles the word
    for w in CORPUS_WORDS:
        pieces = encode_word_wp(w, vset)
        assert pieces != [UNK]
        rebuilt = pieces[0] + "".join(p[len(CONT):] for p in pieces[1:])
        assert rebuilt == w
        assert all(p in vset for p in pieces)


def test_encode_greedy_longest_match_first():
    vocab = {UNK, "a", "b", "c", "ab", "abc", CONT + "c", CONT + "bc"}
    # longest prefix 'abc' wins over 'ab'+'##c' and 'a'+'##bc'
    assert encode_word_wp("abc", vocab) == ["abc"]
    # after 'ab', continuation must carry ##
    assert encode_word_wp("abc", vocab - {"abc"}) == ["ab", CONT + "c"]
    # no initial match at position 0 ('z' absent) -> whole word UNK
    assert encode_word_wp("zab", vocab) == [UNK]
    # dead end mid-word -> whole word UNK, not a partial emit
    assert encode_word_wp("abz", vocab) == [UNK]


def test_distributed_encode_restores_order_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "hug pun"), (2, "pun zzq hug"), (3, "")],
        ["doc_id", "text"],
    )
    vocab, _ = wordpiece_vocab(_corpus_df(spark), "text", 8)
    out = {r.doc_id: r for r in wordpiece_encode(df, "text", "doc_id", vocab).collect()}
    vset = set(vocab)
    exp1 = encode_word_wp("hug", vset) + encode_word_wp("pun", vset)
    assert list(out[1].wp_tokens) == exp1
    assert out[1].n_unk == 0
    # 'zzq' contains chars outside the training corpus -> [UNK]
    exp2 = encode_word_wp("pun", vset) + [UNK] + encode_word_wp("hug", vset)
    assert list(out[2].wp_tokens) == exp2
    assert out[2].n_unk == 1
    assert out[2].n_wp_tokens == len(exp2)
    # empty doc absent (posexplode drops it) — the bpe_encode contract
    assert 3 not in out
