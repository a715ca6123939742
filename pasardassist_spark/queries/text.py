"""Text-analysis queries over the documents table (driver extension surface:
language-ID, quality scoring, token counting, fingerprinting).

Oracle SQL is *generated from the same constants* as the Spark expressions
(marker lists, stopwords, weights) so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pasardassist_spark.operators import text as X
from pasardassist_spark.queries.registry import query
from pasardassist_spark.tables import load

# DuckDB fragments mirroring operators/text.py
_TOKS_SQL = "string_split_regex(trim(text), '\\s+')"


def _hits_sql(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"CAST(len(list_filter({_TOKS_SQL}, t -> t IN ({lst}))) AS BIGINT)"


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({_TOKS_SQL})) AS BIGINT) AS n_types,
           CAST(len(list_distinct({_TOKS_SQL})) AS DOUBLE)
               / len({_TOKS_SQL}) AS type_token_ratio
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, vocabulary size, type-token ratio.
    Pure built-in expressions — runs at parquet-scan speed at 100 TB."""
    d = load(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    n_tok = X.token_count(toks)
    n_types = X.distinct_token_count(toks)
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tok.alias("n_tokens"),
        n_types.alias("n_types"),
        (n_types.cast("double") / n_tok).alias("type_token_ratio"),
    )


_STOP_SQL = _hits_sql(X.STOPWORDS)

@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id, n_tokens, stop_ratio, score,
           CASE WHEN score >= 0.6 THEN 'high'
                WHEN score >= 0.4 THEN 'medium'
                ELSE 'low' END AS quality
    FROM (
        SELECT doc_id, n_tokens, stop_ratio,
               least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4
                   + stop_ratio * 0.3 + ttr * 0.3 AS score
        FROM (
            SELECT doc_id,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
                   CAST({_STOP_SQL} AS DOUBLE) / len({_TOKS_SQL}) AS stop_ratio,
                   CAST(len(list_distinct({_TOKS_SQL})) AS DOUBLE)
                       / len({_TOKS_SQL}) AS ttr
            FROM documents
        )
    )
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length saturation + stopword density + lexical
    diversity -> [0,1] score + bucket. Same double formula both engines."""
    d = load(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    n_tok = X.token_count(toks)
    stop_ratio = X.hits(toks, X.STOPWORDS).cast("double") / n_tok
    ttr = X.distinct_token_count(toks).cast("double") / n_tok
    score = X.quality_score(n_tok, stop_ratio, ttr)
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        score.alias("score"),
        X.quality_bucket(score).alias("quality"),
    )


def _lang_case_sql() -> str:
    langs = list(X.LANG_MARKERS)
    branches = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in langs[i + 1 :]
        )
        branches.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(branches) + f" ELSE '{langs[-1]}' END"


_LANG_SCORES_SQL = ",\n               ".join(
    f"{_hits_sql(words)} AS s_{lang}" for lang, words in X.LANG_MARKERS.items()
)

@query(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang, {_lang_case_sql()} AS predicted_lang
    FROM (
        SELECT doc_id, lang,
               {_LANG_SCORES_SQL}
        FROM documents
    )
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-stopword hit counts per language,
    deterministic argmax with declaration-order tie-break."""
    d = load(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    scores = X.lang_scores(toks)
    return d.select("doc_id", "lang", X.predict_lang(scores).alias("predicted_lang"))


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_min([md5(g) FOR g IN [array_to_string(t[i:i+4], ' ')
                FOR i IN range(1, greatest(len(t) - 3, 1))]]) AS fingerprint
    FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: min-md5 over 5-word shingles (winnowing-style
    min selection). Null for docs shorter than one shingle."""
    d = load(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    return d.select("doc_id", X.fingerprint(toks, 5).alias("fingerprint"))


@query(
    "text_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
               AS BIGINT) AS n_bpe_tokens,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_ws_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish: GPT-2-style pretoken regex (the standard
    fast proxy for LLM token budgets) next to the whitespace count. All
    JVM-side regexp — the 100 TB form of 'how many tokens is this corpus'."""
    from pasardassist_spark.operators.text import bpe_ish_tokens, tokens

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select(
        "doc_id",
        F.size(bpe_ish_tokens(F.col("text"))).cast("long").alias("n_bpe_tokens"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
    )
