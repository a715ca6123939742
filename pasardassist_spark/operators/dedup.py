"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, and blocked n-gram Jaccard.

Design for 100 TB:

- **exact_dedup** is a single hash-shuffle on a 16-byte digest — the digest
  (not the document body) is the shuffle key, so shuffle volume is O(rows),
  not O(bytes).
- **minhash_lsh_pairs** never compares all pairs: shingles -> per-permutation
  min-hashes (one partial-aggregating shuffle keyed by (doc, perm)) -> band
  signatures -> a self-equi-join on (band, signature). Candidate volume is
  sum over buckets of |bucket|^2; band width tunes the precision/recall
  trade, and AQE's skew handling splits pathological buckets.
- **simhash_signatures** is pure column math (explode tokens x bits, two
  aggregations); near-dup lookup is then a Hamming-ball probe on the 32-bit
  signature, e.g. joining on 16-bit halves (pigeonhole) — provided by
  ``simhash_near_pairs``.
- **jaccard_pairs** uses inverted-index blocking (join on shared shingles
  within a blocking key) rather than a cross join, the standard set-similarity
  join shape.

All hashes are md5-based so results are engine-portable (DuckDB oracles).
xxhash64 would be ~3x faster JVM-side; portability wins for the correctness
gate and the swap is a one-line change in ``_hash``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from pasardassist_spark.operators.text import tokens, word_ngrams

N_PERMS = 8
N_BANDS = 4  # => 2 rows per band


def normalized(text: Column) -> Column:
    return F.lower(F.trim(text))


def content_hash(text: Column) -> Column:
    return F.md5(normalized(text))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Tag each row with its content-hash group: group size, canonical
    (minimum) id, and whether this row is the keeper.

    Reference analog: idempotent upsert by natural key (db.service.ts:154-160)
    generalized to content identity.
    """
    h = content_hash(F.col(text_col))
    w = W.partitionBy("content_hash")
    return (
        df.withColumn("content_hash", h)
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
        .withColumn("keep_id", F.min(id_col).over(w))
        .withColumn("is_canonical", (F.col(id_col) == F.col("keep_id")))
    )


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 5) -> DataFrame:
    """Distinct word-n-gram shingles, one row per (id, shingle)."""
    toks = tokens(F.col(text_col))
    return (
        df.filter(F.size(toks) >= n)
        .select(F.col(id_col), F.explode(F.array_distinct(word_ngrams(toks, n))).alias("shingle"))
    )


def minhash_signatures(sh: DataFrame, id_col: str, n_perms: int = N_PERMS) -> DataFrame:
    """Per-(doc, permutation) min-hash: min over shingles of md5(p:shingle).

    The seeded-concat md5 plays the role of N independent hash permutations.
    Partial aggregation (map-side min) keeps the shuffle at O(docs x perms).
    """
    perms = sh.sparkSession.range(n_perms).select(F.col("id").cast("int").alias("p"))
    return (
        sh.crossJoin(F.broadcast(perms))
        .groupBy(id_col, "p")
        .agg(F.min(F.md5(F.concat(F.col("p").cast("string"), F.lit(":"), F.col("shingle")))).alias("mh"))
    )


def lsh_band_signatures(mh: DataFrame, id_col: str, n_bands: int = N_BANDS) -> DataFrame:
    """Group permutations into bands; band signature = ordered concat of mins."""
    rows_per_band = N_PERMS // n_bands
    banded = mh.withColumn("band", (F.col("p") / rows_per_band).cast("int"))
    sig = F.array_join(
        F.transform(F.array_sort(F.collect_list(F.struct("p", "mh"))), lambda x: x["mh"]),
        "|",
    )
    return banded.groupBy(id_col, "band").agg(sig.alias("sig"))


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any LSH band bucket."""
    sh = shingles(df, text_col, id_col)
    bs = lsh_band_signatures(minhash_signatures(sh, id_col), id_col)
    a = bs.select(F.col(id_col).alias("doc_a"), "band", "sig")
    b = bs.select(F.col(id_col).alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# --- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 32


def _hex_digit_val(d: Column) -> Column:
    """Hex digit -> 0..15 (base conversion; DuckDB oracle mirrors via
    position lookup in '0123456789abcdef')."""
    return F.conv(d, 16, 10).cast("int")


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """32-bit SimHash over distinct tokens (md5-derived bit planes).

    explode(tokens x bit positions) -> per-bit +/-1 vote sum -> majority bit
    -> weighted sum back to one BIGINT signature. Two aggregations, all
    integer math: deterministic under any partitioning.
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), F.explode(F.array_distinct(toks)).alias("t")).withColumn(
        "h", F.md5(F.col("t"))
    )
    bits = base.sparkSession.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("b"))
    digit = F.substring(F.col("h"), (F.col("b") / 4).cast("int") + 1, 1)
    val = _hex_digit_val(digit)
    bit = F.floor(val / F.pow(F.lit(2.0), F.lit(3) - (F.col("b") % 4))).cast("int") % 2
    votes = (
        base.crossJoin(F.broadcast(bits))
        .withColumn("vote", bit * 2 - 1)
        .groupBy(id_col, "b")
        .agg(F.sum("vote").alias("s"))
    )
    weight = F.expr(f"shiftleft(CAST(1 AS BIGINT), {SIMHASH_BITS - 1} - b)")
    return votes.groupBy(id_col).agg(
        F.sum(F.when(F.col("s") > 0, weight).otherwise(F.lit(0).cast("long"))).alias("simhash")
    )


def simhash_near_pairs(sig: DataFrame, id_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit halves (pigeonhole: any
    pair within Hamming distance <= max_hamming < 2 shares at least one
    exact half), then verify the full Hamming distance."""
    lo = F.col("simhash").bitwiseAND(F.lit((1 << 16) - 1))
    hi = F.shiftright(F.col("simhash"), 16)
    blocks = sig.select(
        F.col(id_col), "simhash", F.explode(F.array(F.struct(F.lit(0).alias("half"), lo.alias("key")), F.struct(F.lit(1).alias("half"), hi.alias("key")))).alias("blk")
    ).select(F.col(id_col), "simhash", F.col("blk.half").alias("half"), F.col("blk.key").alias("key"))
    a = blocks.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "half", "key")
    b = blocks.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "half", "key")
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["half", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --- Blocked n-gram Jaccard ------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Set-similarity join: distinct n-gram inverted index within blocking
    keys, pair counts by shared shingles, Jaccard >= threshold."""
    toks = tokens(F.col(text_col))
    grams = (
        df.filter(F.size(toks) >= n)
        .select(
            F.col(id_col), *block_cols, F.explode(F.array_distinct(word_ngrams(toks, n))).alias("g")
        )
    )
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    a = grams.select(F.col(id_col).alias("doc_a"), *[F.col(c).alias(f"a_{c}") for c in block_cols], "g")
    b = grams.select(F.col(id_col).alias("doc_b"), *[F.col(c).alias(f"b_{c}") for c in block_cols], "g")
    cond = [a[f"a_{c}"] == b[f"b_{c}"] for c in block_cols]
    inter = (
        a.join(b, [a.g == b.g, a.doc_a < b.doc_b, *cond])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_grams").alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
