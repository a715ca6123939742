"""WordPiece tokenizer: score-ranked merge training and greedy
longest-match-first encoding (the BERT tokenizer family).

Public algorithm (Schuster & Nakajima 2012; Wu et al. 2016 "Google's
NMT"; the HuggingFace tokenizers documentation describes the exact
training loop): identical loop structure to BPE except the next merge
maximizes the LIKELIHOOD score count(ab) / (count(a) * count(b)) rather
than the raw pair count — preferring pairs whose parts rarely occur
apart — and word-internal continuation symbols carry the ``##`` prefix.
Encoding is NOT merge-replay: it is greedy longest-prefix matching
against the final vocab, with a whole-word fallback to ``[UNK]``.

This completes the subword-tokenizer family next to operators/bpe.py
(frequency-ranked merges) and operators/unigram.py (EM-pruned unigram
LM): the three published algorithms production tokenizers use.

Scale shape shared with bpe.py: all corpus-sized work is the ONE
word-type groupBy (Zipf: types << tokens); each training round is two
aggregations over the type table plus a 1-row argmax; encoding runs
once per distinct TYPE through an Arrow-batched pandas UDF against the
broadcast vocab (greedy matching is inherently per-word sequential —
Python is justified over types only, never the token stream).

Reference parity: the reference ships no tokenizer (its text surface is
search regexes, src/modules/app/app.service.ts:446-474); this operator
belongs to the LLM-training-data extension surface.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

CHECKPOINT_EVERY = 5
UNK = "[UNK]"
CONT = "##"


def _wp_symbols(word_col) -> F.Column:
    """Initial WordPiece symbolization: first char plain, every later
    char prefixed with the continuation marker."""
    chars = F.split(word_col, r"(?!^)(?=.)")
    return F.transform(
        chars,
        lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit(CONT), c)),
    )


def _strip_cont(sym: str) -> str:
    return sym[len(CONT) :] if sym.startswith(CONT) else sym


def train_wordpiece(
    corpus: DataFrame, text_col: str, n_merges: int
) -> list[tuple[str, str, float]]:
    """Learn ``n_merges`` WordPiece merges; returns [(left, right, score)]
    in merge order. Deterministic: ties break on (score desc, left,
    right); pairs below absolute count 2 stop training (a score over
    singletons is noise).

    Per round: one adjacent-pair aggregation and one symbol-count
    aggregation over the word-TYPE table (both hash shuffles bounded by
    type volume), then a 1-row argmax — the bpe.py loop with the score
    numerator/denominator joined in."""
    from pasardassist_spark.operators.bpe import _pair_counts
    from pasardassist_spark.operators.text import tokens

    types_df = (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_wp_symbols(F.col("w")).alias("syms"), "cnt")
        .localCheckpoint()
    )
    prev_ckpt = types_df
    merges: list[tuple[str, str, float]] = []
    for i in range(n_merges):
        sym_counts = (
            types_df.select(F.explode("syms").alias("s"), "cnt")
            .groupBy("s")
            .agg(F.sum("cnt").alias("sc"))
        )
        scored = (
            _pair_counts(types_df)
            .join(sym_counts.select(F.col("s").alias("left"), F.col("sc").alias("lc")), "left")
            .join(sym_counts.select(F.col("s").alias("right"), F.col("sc").alias("rc")), "right")
            .withColumn(
                "score",
                F.col("n").cast("double")
                / (F.col("lc").cast("double") * F.col("rc").cast("double")),
            )
        )
        top = (
            scored.filter(F.col("n") >= 2)
            .orderBy(F.desc("score"), "left", "right")
            .head(1)
        )
        if not top:
            break
        left, right, score = top[0]["left"], top[0]["right"], float(top[0]["score"])
        merges.append((left, right, score))
        # merged symbol keeps LEFT's continuation status; RIGHT's ##
        # marker dissolves into the join (ab / ##ab, never a####b)
        types_df = _apply_merge_wp(types_df, left, right)
        if (i + 1) % CHECKPOINT_EVERY == 0:
            types_df = types_df.localCheckpoint()
            prev_ckpt.unpersist()
            prev_ckpt = types_df
    prev_ckpt.unpersist()
    return merges


def _apply_merge_wp(types_df: DataFrame, left: str, right: str) -> DataFrame:
    """bpe._apply_merge with WordPiece join semantics: the merged symbol
    is left + right-without-##."""
    a, b = F.lit(left), F.lit(right)
    joined = F.lit(left + _strip_cont(right))
    merged = F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(joined)),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return types_df.select(merged.alias("syms"), "cnt")


def wordpiece_vocab(
    corpus: DataFrame, text_col: str, n_merges: int
) -> tuple[list[str], list[tuple[str, str, float]]]:
    """Train and assemble the shipped vocab: [UNK], then every observed
    initial/continuation character (sorted), then each merge's product
    in merge order (the deterministic BERT-style layout). Returns
    (vocab list, merges)."""
    from pasardassist_spark.operators.text import tokens

    merges = train_wordpiece(corpus, text_col, n_merges)
    chars = (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .select(F.explode(_wp_symbols(F.col("w"))).alias("s"))
        .distinct()
        .orderBy("s")
        .collect()
    )
    vocab: list[str] = [UNK] + [r.s for r in chars]
    seen = set(vocab)
    for left, right, _ in merges:
        prod = left + _strip_cont(right)
        if prod not in seen:
            seen.add(prod)
            vocab.append(prod)
    return vocab, merges


def encode_word_wp(word: str, vocab: set[str]) -> list[str]:
    """BERT greedy longest-match-first: repeatedly take the LONGEST vocab
    entry matching a prefix of what remains (continuation pieces carry
    ##); if some position matches nothing, the WHOLE word becomes [UNK]
    (the published WordPieceTokenizer semantics, not a partial emit)."""
    out: list[str] = []
    pos = 0
    while pos < len(word):
        end = len(word)
        piece = None
        while end > pos:
            cand = word[pos:end]
            if pos > 0:
                cand = CONT + cand
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        pos = end
    return out


def wordpiece_encode(
    corpus: DataFrame, text_col: str, id_col: str, vocab: list[str]
) -> DataFrame:
    """Tokenize the corpus under a trained vocab: word-TYPE-grain greedy
    matching (Arrow-batched over distinct types with the vocab as a
    broadcast set), type→pieces joined back on the word equi-key,
    per-doc order restored by position (the bpe_encode plan shape).

    Returns (id_col, wp_tokens array<string>, n_wp_tokens long,
    n_unk long)."""
    from pyspark.sql.functions import pandas_udf

    from pasardassist_spark.operators.text import tokens

    vset = set(vocab)

    @pandas_udf("array<string>")
    def _encode(words: pd.Series) -> pd.Series:
        return words.map(lambda w: encode_word_wp(w, vset))

    doc_words = corpus.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w"),
    ).filter(F.length("w") > 0)  # empty text -> split yields one "" token
    types = doc_words.select("w").distinct().select(
        "w", _encode(F.col("w")).alias("pieces")
    )
    return (
        doc_words.join(types, "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(F.collect_list(F.struct("pos", "pieces"))).pieces
            ).alias("wp_tokens")
        )
        .select(
            id_col,
            "wp_tokens",
            F.size("wp_tokens").cast("long").alias("n_wp_tokens"),
            F.size(F.filter("wp_tokens", lambda t: t == UNK))
            .cast("long")
            .alias("n_unk"),
        )
    )
