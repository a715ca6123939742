"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, and blocked n-gram Jaccard.

Design for 100 TB:

- **exact_dedup** is a single hash-shuffle on a 16-byte digest — the digest
  (not the document body) is the shuffle key, so shuffle volume is O(rows),
  not O(bytes).
- **minhash_lsh_pairs** never compares all pairs: shingles -> N codegen'd
  seeded min-hash aggregates in ONE groupBy(doc) (no ×N row amplification)
  -> band signatures (columnar, no extra shuffle) -> a self-equi-join on
  (band, signature). Candidate volume is sum over buckets of |bucket|^2;
  band width tunes the precision/recall trade, and AQE's skew handling
  splits pathological buckets.
- **simhash_signatures** is pure column math: ``bits`` (32/64)
  constant-unrolled vote aggregates in one groupBy(doc) (no ×bits
  amplification, all codegen'd); near-dup lookup is then a Hamming-ball
  probe via exact ``bits/(max_hamming+1)``-wide bit-slice blocks
  (pigeonhole guarantees recall) — provided by ``simhash_near_pairs``.
- **jaccard_pairs** uses inverted-index blocking (join on shared shingles
  within a blocking key) rather than a cross join, the standard set-similarity
  join shape.

All hashes are md5-based so results are engine-portable (DuckDB oracles).
xxhash64 would be ~3x faster JVM-side; portability wins for the correctness
gate and the swap is a one-line change in ``_hash``.

Cache-lifetime contract (r19, ADVICE note): operators here persist()
decision-sized intermediates that the RETURNED plan still references, so
they cannot unpersist before their terminal action — the CALLER owns
cache lifetime. Release between independent queries with
``pasardassist_spark.caching.release_all(spark)`` (bench.py and
tools/full_sweep.py do); a long-lived session that never releases
accumulates MEMORY_AND_DISK blocks for its lifetime.
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
    """One row per doc with an ``array<string>`` of n_perms min-hashes.

    The seeded-concat md5 plays the role of N independent hash permutations.
    All N hashes are computed as N codegen'd expressions on the shingle row
    and reduced by a single groupBy(doc) with N min aggregates — the shingle
    table is scanned once at its natural size, never multiplied ×N by a
    crossJoin, and the only shuffle is O(docs × N) partial-aggregated mins.
    """
    # Constant-unrolled: one min-aggregate per permutation with a
    # constant-folded seed prefix — stays inside whole-stage codegen (a
    # transform(...) lambda would drop each element to the interpreted path).
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{p}:"), F.col("shingle")))).alias(f"mh_{p}")
        for p in range(n_perms)
    ]
    wide = sh.groupBy(id_col).agg(*aggs)
    return wide.select(
        F.col(id_col), F.array(*[F.col(f"mh_{p}") for p in range(n_perms)]).alias("mhs")
    )


def lsh_band_signatures(
    mh: DataFrame, id_col: str, n_perms: int = N_PERMS, n_bands: int = N_BANDS
) -> DataFrame:
    """Band signature = ordered concat of that band's min-hashes. Computed
    columnar from the wide signature array (no extra shuffle), then exploded
    to one row per (doc, band) for the bucket self-join."""
    rows_per_band = n_perms // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.array_join(F.slice(F.col("mhs"), k * rows_per_band + 1, rows_per_band), "|").alias("sig"),
            )
            for k in range(n_bands)
        ]
    )
    return (
        mh.select(F.col(id_col), F.explode(bands).alias("bs"))
        .select(F.col(id_col), F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any LSH band bucket.

    Bucket grouping, not a self-join (r19): collect each (band, sig)
    bucket's member ids with ONE groupBy and emit the id < id pairs with
    a per-bucket explode. The r18 self-join form evaluated the whole
    scan + shingle + 8-permutation min-hash subtree once PER SIDE
    (Catalyst cannot reuse a subtree across a self-join); the r18 persist
    fixed the duplicate work but its materialization barrier + cache
    write cost ~1 s at local[32] (driver-measured 2.34 -> 3.34 s). The
    grouped form computes the subtree exactly once with no persist and
    shuffles the band rows once instead of twice. Candidate volume is
    unchanged (per-bucket quadratic); a bucket is a full 2-minhash band
    signature, so hot buckets are true near-dup clusters — the pair
    explode for a cluster of m docs emits from m rows after the first
    explode, and pathological clusters should be exact-deduped upstream
    (the same caveat the join form's AQE skew-split carried)."""
    sh = shingles(df, text_col, id_col)
    bs = lsh_band_signatures(minhash_signatures(sh, id_col), id_col)
    buckets = (
        bs.groupBy("band", "sig")
        .agg(F.collect_list(F.col(id_col)).alias("_ids"))
        .filter(F.size("_ids") >= 2)
    )
    return (
        buckets.select(F.explode("_ids").alias("doc_a"), "_ids")
        .select(
            "doc_a",
            F.explode(
                F.filter(F.col("_ids"), lambda y: y > F.col("doc_a"))
            ).alias("doc_b"),
        )
        .distinct()
    )


# --- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 32


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """``bits``-wide SimHash over distinct tokens (md5-derived bit planes).

    Each token row feeds ``bits`` constant-unrolled ±1 vote expressions
    (codegen'd — a transform() lambda would fall to the interpreted path); a
    single groupBy(doc) with ``bits`` partial-aggregated sums tallies the
    votes, and the majority bits fold into one BIGINT signature in the same
    pass. One shuffle at O(docs × bits) — the token table is never
    multiplied ×bits by a crossJoin. All integer math: deterministic under
    any partitioning.

    ``bits`` may be 32 (compact; saturates around ~100 M docs) or 64 (the
    scale default for near-dup retrieval). 128 would need an array-of-2-longs
    signature — md5 supplies the bit planes, but BIGINT holds only 64.
    """
    if bits not in (32, 64):
        raise ValueError(f"bits must be 32 or 64, got {bits}")
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), F.explode(F.array_distinct(toks)).alias("t")).withColumn(
        "h", F.md5(F.col("t"))
    )
    # Parse each 8-hex-char half of the digest into a long ONCE per token
    # row; every vote is then a shift-and-mask on that long. The per-bit
    # form (substring + base-conv per vote) costs 32-64 string conversions
    # per token row — ~20% of the whole query at sf0.1. Bit b of the
    # signature is bit (31 - b%32) of half b//32, identical values by
    # construction (the hex string is most-significant-digit first); the
    # oracle keeps the per-digit SQL form, so the equivalence is
    # differentially checked, not assumed.
    base = base.select(
        F.col(id_col),
        *[
            F.conv(F.substring("h", 1 + 8 * i, 8), 16, 10)
            .cast("long")
            .alias(f"_h{i}")
            for i in range(bits // 32)
        ],
    )

    def vote(b: int) -> Column:
        half = F.col(f"_h{b // 32}")
        bit = F.shiftright(half, 31 - (b % 32)).bitwiseAND(F.lit(1))
        return (bit * 2 - 1).cast("long")

    aggs = [F.sum(vote(b)).alias(f"s_{b}") for b in range(bits)]
    wide = base.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        # shiftleft (not a Python literal) so bit 63 wraps to the sign bit —
        # the distinct powers sum carry-free into the exact bit pattern.
        weight = F.shiftleft(F.lit(1).cast("long"), bits - 1 - b)
        sig = sig + F.when(F.col(f"s_{b}") > 0, weight).otherwise(F.lit(0).cast("long"))
    return wide.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    sig: DataFrame, id_col: str, max_hamming: int = 3, bits: int = SIMHASH_BITS
) -> DataFrame:
    """Near-dup pairs by SimHash: block on ``max_hamming + 1`` equal-width
    bit slices of the signature. Pigeonhole: a pair within Hamming distance
    <= max_hamming differs in at most max_hamming slices, so it agrees
    EXACTLY on at least one — the block join has guaranteed recall. The
    full Hamming distance is then verified on each candidate.

    Block width is ``bits // (max_hamming + 1)`` (must divide evenly): at
    32 bits that is 8-bit slices = 256 buckets per slice (fine to ~100 M
    docs); at 64 bits, 16-bit slices = 65 536 buckets per slice — the
    billion-doc setting. Raising ``bits`` and width together is the scale
    rule; hot buckets beyond that are AQE skew-split territory.
    """
    n_blocks = max_hamming + 1
    if bits % n_blocks:
        raise ValueError(f"bits={bits} not divisible by max_hamming+1={n_blocks}")
    width = bits // n_blocks
    mask = (1 << width) - 1
    slices = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                # arithmetic shift then mask: sign-extension bits land above
                # the mask, so negative (bit-63-set) signatures key correctly
                F.shiftright(F.col("simhash"), width * q).bitwiseAND(F.lit(mask)).alias("key"),
            )
            for q in range(n_blocks)
        ]
    )
    # persist + bucket SELF-JOIN — deliberately NOT the bucket-grouping
    # form minhash_lsh_pairs uses (r19, measured): slice keys are only
    # ``width`` bits of the signature, so one hot key can own a large
    # fraction of the corpus (sf0.1: max bucket 1639 of 5000 docs,
    # 2.4 M candidate pairs, 1.3 M of them inside the single hot bucket).
    # collect_list would put that whole bucket's quadratic explode in ONE
    # task (isolated A/B: +20-25% at both 8 and 32 cores); the equi-join
    # keeps it splittable (AQE skew-split), and the persist keeps the
    # expensive vote-sum subtree single-evaluation across the two sides.
    blocks = sig.select(F.col(id_col), "simhash", F.explode(slices).alias("blk")).select(
        F.col(id_col), "simhash", F.col("blk.q").alias("q"), F.col("blk.key").alias("key")
    ).persist()
    a = blocks.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "q", "key")
    b = blocks.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "q", "key")
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["q", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        # verify BEFORE distinct: most candidates fail the Hamming test, so
        # the dedup shuffle only carries survivors (a pair can collide in up
        # to 4 quarters), not the full per-bucket quadratic blow-up.
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
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
    # persist: three consumers (sizes, both join sides) would otherwise
    # re-run the scan + tokenize + n-gram explode three times (r18).
    grams = (
        df.filter(F.size(toks) >= n)
        .select(
            F.col(id_col), *block_cols, F.explode(F.array_distinct(word_ngrams(toks, n))).alias("g")
        )
        .persist()
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


PASSAGE_TOKENS = 10  # non-overlapping chunk width for passage-level dedup


def passage_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = PASSAGE_TOKENS,
) -> DataFrame:
    """C4/CCNet-style passage-level exact dedup: split every document into
    non-overlapping ``chunk_tokens``-token passages, keep only the globally
    FIRST occurrence of each distinct passage (min ``(id, position)``), and
    reassemble the surviving passages in document order.

    Reference analog: none — the reference dedups whole rows by natural key
    (db.service.ts:154-160); this is the sub-document form every large
    crawl pipeline applies (C4 drops repeated 3-sentence spans, CCNet drops
    duplicated paragraphs) adapted to newline-free text via fixed token
    windows.

    Scale shape: two hash shuffles, both O(corpus tokens) —
    (1) the first-occurrence window partitions on the passage's 16-byte
    md5 digest (never the raw string, so comparator cost stays flat as
    passages grow), (2) the reassembly groupBy partitions on the doc id.
    No self-join, no all-pairs anything; a doc whose passages are all
    duplicates survives with ``clean_text = ''`` so downstream filters see
    the drop rather than silently losing the row.

    Returns one row per input doc:
    ``(id, clean_text, n_kept, n_dropped)``.
    """
    toks = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    exploded = (
        # size(tokens) >= 1 always holds for non-empty trimmed text; the
        # filter guards sequence(0, -1) on genuinely empty strings.
        df.filter(F.size(toks) >= 1)
        .select(F.col(id_col), F.posexplode(chunks).alias("cpos", "passage"))
    )
    w = W.partitionBy(F.md5(F.col("passage"))).orderBy(id_col, "cpos")
    kept = exploded.withColumn(
        "is_first", F.row_number().over(w) == 1
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("is_first"),
                                F.struct(F.col("cpos"), F.col("passage")),
                            )
                        )
                    ),
                    lambda s: s.passage,
                ),
                " ",
            ).alias("clean_text"),
            F.sum(F.col("is_first").cast("long")).alias("n_kept"),
            F.sum((~F.col("is_first")).cast("long")).alias("n_dropped"),
        )
    )


def incremental_dedup(
    batch: DataFrame, snapshot: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Cross-corpus dedup: flag each NEW document that exactly or nearly
    duplicates the EXISTING snapshot — the standard operation when
    extending a training corpus with a fresh crawl (the snapshot is the
    already-trained-on data; near-dups against it are leakage/repetition,
    not new signal).

    Scale shape: the snapshot side reduces to its DISTINCT content digests
    and DISTINCT LSH band signatures before either join — tiny versus the
    raw snapshot text, and both joins are digest-keyed semi-join shuffles.
    New×old text pairs are never materialized; at 100 TB the snapshot
    digests/signatures are a standing index you append to per batch, so
    each increment costs O(batch) + a join against the index.

    Returns one row per batch doc: (id, dup_exact, dup_near, keep).
    """
    bh = batch.select(
        F.col(id_col), F.col(text_col).alias("_t")
    ).withColumn("content_hash", content_hash(F.col("_t")))
    snap_hashes = (
        snapshot.select(content_hash(F.col(text_col)).alias("content_hash"))
        .distinct()
        .withColumn("_hit_exact", F.lit(True))
    )
    snap_sigs = (
        lsh_band_signatures(
            minhash_signatures(shingles(snapshot, text_col, id_col), id_col), id_col
        )
        .select("band", "sig")
        .distinct()
    )
    batch_sigs = lsh_band_signatures(
        minhash_signatures(shingles(batch, text_col, id_col), id_col), id_col
    )
    near_ids = (
        batch_sigs.join(snap_sigs, ["band", "sig"], "left_semi")
        .select(F.col(id_col))
        .distinct()
        .withColumn("_hit_near", F.lit(True))
    )
    return (
        bh.join(snap_hashes, "content_hash", "left")
        .join(near_ids, id_col, "left")
        .withColumn("dup_exact", F.coalesce(F.col("_hit_exact"), F.lit(False)))
        .withColumn("dup_near", F.coalesce(F.col("_hit_near"), F.lit(False)))
        .select(
            F.col(id_col),
            "dup_exact",
            "dup_near",
            (~(F.col("dup_exact") | F.col("dup_near"))).alias("keep"),
        )
    )


def prefix_filtered_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    ngram: int = 3,
) -> DataFrame:
    """Exact set-similarity self-join via prefix filtering (AllPairs /
    PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08): two
    token sets with Jaccard >= t must share at least one token among
    each set's |x| - ceil(t*|x|) + 1 RAREST tokens, so only those prefix
    tokens enter the inverted index and the candidate join touches a
    tiny, rare-token slice of the posting lists. The complement to
    MinHash-LSH (`minhash_lsh_pairs`): exact — no recall loss — at the
    price of scaling with true-pair density rather than corpus size.

    The global element order every prefix must agree on is (document
    frequency asc, element asc) — realized as sortable (df, element)
    STRUCT values, never a row_number over the vocabulary, so no
    single-task global window exists anywhere in the plan.

    Set elements are distinct ``ngram``-word shingles over lowercase
    alphanumeric tokens (``ngram=1`` degrades to plain token sets).
    Prefix filtering's pruning power is the rarity of each set's rarest
    elements; single tokens over a small vocabulary have none (every
    posting list is hot and the candidate join quadratically explodes —
    measured 11.3M candidates from 5k docs on a 31-word vocabulary), so
    shingling is what makes the technique hold on repetitive corpora,
    exactly as in the MinHash pipeline. Documents shorter than ``ngram``
    tokens have no shingle set and are excluded.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard exact
    and rounded to 6 dp.
    """
    from pasardassist_spark.operators.text import word_ngrams

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    elems = (
        F.array_distinct(word_ngrams(toks, ngram))
        if ngram > 1
        else F.array_distinct(toks)
    )
    t = df.select(F.col(id_col).alias("_id"), elems.alias("toks")).filter(
        F.size("toks") > 0
    )
    # persist: ``tok`` feeds the vocabulary count AND the rarity join, and
    # ``pre`` (below) feeds FOUR consumers (both sides of the prefix-token
    # candidate self-join plus the sa/sb verification sides). Unstaged, the
    # scan + tokenize + shingle + rarity-sort subtree re-ran for every
    # consumer — 16 parquet scans of ``documents`` in the r18 plan audit.
    # Staged frames are decision-sized proxies (id, shingle tokens, sizes);
    # cache hygiene is the session owner's (bench/sweep clearCache).
    tok = t.select("_id", F.explode("toks").alias("token")).persist()
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df_"))
    # per-doc tokens sorted by global rarity; prefix keeps the rarest
    # |x| - ceil(t*|x|) + 1
    ordered = (
        tok.join(vocab, "token")
        .groupBy("_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df_"), F.col("token")))
            ).alias("ord")
        )
        .select(
            "_id",
            F.transform("ord", lambda x: x["token"]).alias("stoks"),
            F.size("ord").alias("sz"),
        )
    )
    plen = F.col("sz") - F.ceil(F.col("sz") * F.lit(threshold)) + 1
    pre = ordered.select(
        "_id",
        "stoks",
        "sz",
        F.slice("stoks", 1, plen.cast("int")).alias("prefix"),
    ).persist()
    inv = pre.select("_id", F.explode("prefix").alias("token"))
    cand = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b")
        )
        .distinct()
    )
    sa = pre.select(
        F.col("_id").alias("doc_a"),
        F.col("stoks").alias("ta"),
        F.col("sz").alias("na"),
    )
    sb = pre.select(
        F.col("_id").alias("doc_b"),
        F.col("stoks").alias("tb"),
        F.col("sz").alias("nb"),
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.col("na") + F.col("nb") - inter
    jac = inter.cast("double") / union
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter((union > 0) & (jac >= threshold))
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


BOILERPLATE_MAX_DF = 3  # a passage in >= this many docs is boilerplate


def boilerplate_strip(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = PASSAGE_TOKENS,
    max_df: int = BOILERPLATE_MAX_DF,
) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate removal: drop every passage whose
    DOCUMENT FREQUENCY (count of distinct docs containing it) reaches
    ``max_df``, from EVERY document — including the first occurrence.

    The complement to :func:`passage_dedup`, which keeps one copy of each
    duplicated passage: headers, cookie banners, and license blurbs appear
    in thousands of documents and are noise in all of them, so the
    high-DF filter removes the passage everywhere, while a passage merely
    duplicated within one document (df=1) survives untouched. (CCNet
    applies this as paragraph-hash frequency filtering; RefinedWeb as
    line-wise filtering; re-expressed here over the same fixed
    ``chunk_tokens``-token windows as passage_dedup since this corpus is
    newline-free.)

    Scale shape — three hash shuffles, all O(corpus tokens), no self-join:
    (1) the DF aggregation groups on the passage's 16-byte md5 digest
    (count distinct doc per digest), (2) the digest-keyed join carries the
    DF back onto the exploded passages (both sides arrive partitioned on
    the digest, so AQE plans it shuffle-reuse), (3) the reassembly groupBy
    partitions on the doc id. The DF table is |distinct passages| rows —
    at 100 TB it is the passage vocabulary, far smaller than the corpus,
    and ultra-hot digests cost ONE counter row here (contrast an
    all-occurrence window, whose partition would hold every copy).

    Returns one row per input doc (docs with >= 1 token):
    ``(id, clean_text, n_kept, n_dropped)`` — same contract as
    passage_dedup, so downstream filters compose identically.
    """
    toks = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    exploded = (
        df.filter(F.size(toks) >= 1)
        .select(F.col(id_col), F.posexplode(chunks).alias("cpos", "passage"))
        .withColumn("dig", F.md5(F.col("passage")))
    )
    df_counts = exploded.groupBy("dig").agg(
        F.countDistinct(id_col).alias("_df")
    )
    kept = exploded.join(df_counts, "dig").withColumn(
        "is_kept", F.col("_df") < max_df
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("is_kept"),
                                F.struct(F.col("cpos"), F.col("passage")),
                            )
                        )
                    ),
                    lambda s: s.passage,
                ),
                " ",
            ).alias("clean_text"),
            F.sum(F.col("is_kept").cast("long")).alias("n_kept"),
            F.sum((~F.col("is_kept")).cast("long")).alias("n_dropped"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    ngram: int = 5,
) -> DataFrame:
    """N-gram CONTAINMENT near-subset detection: directed pairs where
    ``|shingles(src) ∩ shingles(dst)| / |shingles(src)| >= threshold`` —
    the asymmetric counterpart to Jaccard (Broder's resemblance vs
    containment, SEQUENCES'97). Jaccard misses a short document wholly
    quoted inside a much longer one (union is dominated by the long doc);
    containment is exactly the "is src mostly inside dst" question a
    training-corpus build asks when pruning excerpt/quote duplicates.

    Exact, with one LOSSLESS prune: a shingle whose corpus document
    frequency is 1 appears in no other document, so it can contribute to
    no intersection — only df >= 2 shingles enter the candidate self-join.
    (The denominator |shingles(src)| still counts ALL of src's shingles,
    computed before the prune.) Unlike Jaccard prefix filtering there is
    no src-side-only prefix bound for containment at high threshold —
    candidate volume is sum over shared digests of df^2, i.e. it scales
    with TRUE near-dup density, the honest lower bound for an exact
    answer; ultra-hot shingles (boilerplate) should be stripped upstream
    (:func:`boilerplate_strip`) before running an exact containment pass.

    Shuffles: digest-keyed DF agg + two digest-keyed join shuffles +
    one (src,dst) pair agg — all O(shingle occurrences + candidate
    pairs); raw text never enters a join (16-byte md5 digests only).

    Returns ``(src_id, dst_id, n_src, n_shared, containment)`` with
    src != dst, containment exact and rounded to 6 dp.
    """
    # persist: four consumers (sizes, the df aggregate, and both candidate
    # join sides via ``shared``) re-derived the scan + shingle + md5 chain
    # four times unstaged (r18 plan audit). 24 bytes per shingle occurrence
    # — the digest proxy, never text.
    sh = shingles(df, text_col, id_col, ngram).select(
        F.col(id_col).alias("_id"), F.md5("shingle").alias("dig")
    ).persist()
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_src"))
    shared = sh.join(
        sh.groupBy("dig").agg(F.count(F.lit(1)).alias("_df")).filter("_df >= 2"),
        "dig",
    ).drop("_df").persist()
    pairs = (
        shared.select(F.col("_id").alias("src_id"), "dig")
        .join(shared.select(F.col("_id").alias("dst_id"), "dig"), "dig")
        .filter(F.col("src_id") != F.col("dst_id"))
        .groupBy("src_id", "dst_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    cont = F.col("n_shared").cast("double") / F.col("n_src")
    return (
        pairs.join(sizes.withColumnRenamed("_id", "src_id"), "src_id")
        .filter(cont >= threshold)
        .select(
            "src_id", "dst_id", "n_src", "n_shared",
            F.round(cont, 6).alias("containment"),
        )
    )


def exact_substring_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 50,
) -> DataFrame:
    """ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", §4.1): remove every token that lies
    inside a ``min_tokens``-token substring occurring MORE THAN ONCE in
    the corpus — at ARBITRARY offsets, across or within documents. This
    is the published suffix-array method's semantics re-expressed for a
    shuffle engine: a duplicated substring of length >= ``min_tokens``
    exists iff a chain of duplicated ``min_tokens``-grams covers it, so
    marking every position whose ``min_tokens``-gram has corpus count
    >= 2, then taking the coverage union, removes exactly the tokens the
    suffix-array scan removes (all copies — the released
    google-research/deduplicate-text-datasets policy).

    Distributed shape (vs. the paper's single-machine suffix array, which
    needs the whole corpus in one address space):

    1. gram stream — one row per token position, carrying only a 16-byte
       md5 digest of the gram (never the text): O(corpus tokens) rows.
    2. duplicate digests — ONE groupBy on the digest with a count >= 2
       filter; output is |distinct duplicated grams|, tiny vs corpus.
    3. digest-keyed join back marks duplicated start positions; both
       sides arrive hash-partitioned on the digest.
    4. per-doc interval union — a doc-partitioned window merges
       overlapping [pos, pos+k-1] spans (positions per doc, never a
       global sort).
    5. reassembly — merged spans collect to one small array per doc
       (gap count <= dup regions per doc), and the surviving text is
       rebuilt with a single JVM-side fold over the gaps; no UDF.

    Returns one row per input doc:
    ``(id, clean_text, n_tokens, n_removed)`` — ``n_tokens`` the original
    token count; docs with no duplicated span pass through unchanged.
    """
    toks = tokens(F.col(text_col))
    k = min_tokens
    base = df.select(
        F.col(id_col), F.col(text_col), toks.alias("_toks"),
        F.size(toks).alias("n_tokens"),
    )
    grams = (
        base.filter(F.col("n_tokens") >= k)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n_tokens") - k + 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(
                            F.array_join(F.slice(F.col("_toks"), i, k), " ")
                        ).alias("dig"),
                    ),
                )
            ).alias("g"),
        )
        .select(F.col(id_col), F.col("g.pos"), F.col("g.dig"))
    )
    dup_digs = grams.groupBy("dig").agg(
        F.count(F.lit(1)).alias("_n")
    ).filter(F.col("_n") >= 2)
    starts = grams.join(dup_digs, "dig").select(F.col(id_col), "pos")

    # coverage union: spans [pos, pos+k-1]; a new interval begins when the
    # start exceeds the running max end of all earlier spans in the doc
    w = W.partitionBy(id_col).orderBy("pos")
    run_end = F.max(F.col("pos") + k - 1).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    grouped = starts.withColumn(
        "_new", (run_end.isNull() | (F.col("pos") > run_end + 1)).cast("int")
    ).withColumn("_grp", F.sum("_new").over(w))
    intervals = grouped.groupBy(id_col, "_grp").agg(
        F.min("pos").alias("s"), (F.max("pos") + k - 1).alias("e")
    )
    per_doc = intervals.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("_ivs")
    )

    out = base.join(per_doc, id_col, "left")
    # fold over sorted disjoint intervals: emit the gap before each, then
    # the tail after the last
    rebuilt = F.aggregate(
        F.col("_ivs"),
        F.struct(
            F.lit(1).cast("long").alias("nxt"),
            F.array().cast("array<string>").alias("parts"),
        ),
        lambda acc, iv: F.struct(
            (iv.e + 1).cast("long").alias("nxt"),
            F.concat(
                acc.parts, F.slice(F.col("_toks"), acc.nxt, iv.s - acc.nxt)
            ).alias("parts"),
        ),
        lambda acc: F.array_join(
            F.concat(
                acc.parts,
                F.slice(
                    F.col("_toks"), acc.nxt,
                    F.greatest(
                        F.col("n_tokens") - acc.nxt + 1, F.lit(0).cast("long")
                    ),
                ),
            ),
            " ",
        ),
    )
    n_removed = F.aggregate(
        F.col("_ivs"),
        F.lit(0).cast("long"),
        lambda acc, iv: acc + (iv.e - iv.s + 1),
    )
    return out.select(
        F.col(id_col),
        F.when(F.col("_ivs").isNull(), F.col(text_col))
        .otherwise(rebuilt)
        .alias("clean_text"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(n_removed, F.lit(0).cast("long")).alias("n_removed"),
    )
