"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline. The
  query side is broadcast (queries are few), candidates stream: no shuffle
  of the big side at all, and the per-query top-k is a window over
  (query, rounded cosine, id).
- ``random_projection_buckets`` / ``ann_topk``: the scale path — sign-random-
  projection LSH. L tables x B hyperplanes from a seeded generator; vectors
  land in 2^B buckets per table; candidates = bucket collisions in any
  table. At 100 TB the bucket id becomes the partition/bucketing key so a
  query probes L partitions instead of scanning the corpus; recall tunes
  with L and B.

Dot products use built-in higher-order functions (zip_with + aggregate):
JVM-evaluated, sequential fold => deterministic. Cosines are rounded to 6
decimals *before* ranking so rank order is reproducible across engines.
"""

from __future__ import annotations

import math
import random

import pandas as pd  # module-level: pandas_udf resolves string type hints here
from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

LSH_SEED = 42
# 4 tables x 6 planes: on the driver's near-random gaussian embeddings
# (top-10 cosine ~0.25-0.39 => per-plane collision ~0.6) exact-bucket recall
# is ~4 * 0.6^6 ~ 0.18; the default Hamming-1 multi-probe lifts the
# per-table hit rate to p^6 + 6·p^5(1-p) and overall recall to ~0.65
# (pytest-asserted >= 0.35). Production embeddings with real cluster
# structure (near-dup cosine >= 0.8) saturate toward 1.0. Scale rule:
# planes ~ log2(corpus/target_bucket_size), tables = storage budget,
# probe radius = query-time recall budget (costs probes, not storage).
N_TABLES = 4
N_PLANES = 6


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def brute_force_topk(
    emb: DataFrame, query_ids: list[int], k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k for each query id (self excluded)."""
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cosine", "rank")
    )


def hyperplanes(
    dim: int,
    seed: int = LSH_SEED,
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
) -> list[tuple[int, int, list[float]]]:
    """Deterministic (table, plane, weights) list from a seeded PRNG."""
    rng = random.Random(seed)
    planes = []
    for t in range(n_tables):
        for p in range(n_planes):
            planes.append((t, p, [rng.gauss(0.0, 1.0) for _ in range(dim)]))
    return planes


def random_projection_buckets(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """(id, table, bucket) — bucket = sign bits of the hyperplane dots.

    Parameter split by use case: query-time ANN wants FEW WIDE tables plus
    multi-probe (selective buckets, probes are cheap); pair-mining dedup
    wants MORE NARROW tables (collision probability per table must be high
    because a missed pair is gone — there is no query to re-probe)."""
    spark = emb.sparkSession
    planes = spark.createDataFrame(
        hyperplanes(dim, LSH_SEED, n_tables, n_planes), "tbl int, plane int, w array<double>"
    )
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    bit = F.when(dot(F.col("v"), F.col("w")) > 0, 1).otherwise(0)
    return (
        e.crossJoin(F.broadcast(planes))
        .select(F.col(id_col), "tbl", (bit * F.expr("shiftleft(1, plane)")).alias("bitval"))
        .groupBy(id_col, "tbl")
        .agg(F.sum("bitval").alias("bucket"))
    )


def ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_radius: int = 2,
) -> DataFrame:
    """Approximate top-k: candidates from LSH bucket collisions, exact
    cosine re-rank on the (small) candidate set.

    Multi-probe: each query also probes the buckets within Hamming distance
    ``probe_radius`` of its own code in every table — the standard recall
    lever that costs extra PROBES (1+6 per table at radius 1, +15 more at
    radius 2 with 6 planes), not extra tables/storage. Measured at sf0.1
    on the driver's gaussian vectors: radius 1 recall@10 0.74, radius 2
    0.98 at indistinguishable search wall time (the re-rank still touches
    only ~22/64 of each table's bucket space); radius 2 is therefore the
    default operating point. Radius 3+ is rejected: 42/64 buckets probed
    approaches a table scan — add tables instead. Probing is query-side
    only: the corpus keeps one (table, bucket) row per vector, so the
    bucket id stays the partition key at scale.
    """
    if probe_radius > 2:
        raise ValueError(
            f"probe_radius {probe_radius} unsupported (0, 1 or 2): at radius"
            " 3+ the probe count approaches the bucket space and brute force"
            " wins — add tables instead"
        )
    buckets = random_projection_buckets(emb, dim, id_col, vec_col)
    probe_masks = [0]
    if probe_radius >= 1:
        probe_masks += [1 << i for i in range(N_PLANES)]
    if probe_radius >= 2:
        probe_masks += [
            (1 << i) | (1 << j)
            for i in range(N_PLANES)
            for j in range(i + 1, N_PLANES)
        ]
    qb = (
        buckets.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("q_id"),
            "tbl",
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in probe_masks])
            ).alias("bucket"),
        )
    )
    cand = (
        F.broadcast(qb)
        .join(buckets, ["tbl", "bucket"])
        .filter(F.col(id_col) != F.col("q_id"))
        .select("q_id", F.col(id_col).alias("neighbor_id"))
        .distinct()
    )
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    qv = e.select(F.col(id_col).alias("q_id"), F.col("v").alias("qv"))
    nv = e.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("nv"))
    scored = (
        cand.join(F.broadcast(qv), "q_id")
        .join(nv, "neighbor_id")
        .select("q_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cosine", "rank")
    )


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (id_a < id_b, rounded cosine >=
    threshold) — the correctness baseline. All-pairs by construction: use
    ONLY as the oracle-checkable reference; the scale path is
    :func:`cosine_pairs_lsh` (bucket-blocked, never all-pairs)."""
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    a = e.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    return (
        F.broadcast(a)
        .join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup at scale: candidate pairs share an LSH
    bucket in at least one table (sum over buckets of |bucket|^2 candidates,
    never all-pairs), then the exact rounded cosine verifies the threshold.
    Recall vs :func:`cosine_pairs` is pytest-asserted; it rises with the
    corpus's cluster structure exactly like the ANN path. Uses 8 tables x 4
    planes (vs the ANN default 4x6): per-table collision for a
    threshold-cosine pair is p^planes, and with no query-side re-probe
    available, fewer planes per table is the recall lever — 8x4 gives
    ~1-(1-p^4)^8 ~ 0.66 at p~0.6 where 4x6 gives ~0.17."""
    buckets = random_projection_buckets(
        emb, dim, id_col, vec_col, n_tables=8, n_planes=4
    )
    a = buckets.select(F.col(id_col).alias("id_a"), "tbl", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    va = e.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    vb = e.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


IVF_SEED = 7
N_LISTS = 16
# 10/16 lists probed: round-8 retune (VERDICT r6 #4 / r7 #3). Measured
# recall@10 on the sf0.1 synthetic embeddings: 0.66 at 6 probes, 0.80 at
# 8, 0.84 at 10, 0.96 at 12 — search_s flat across the sweep because the
# exact-rerank window dominates at this corpus size. The near-uniform
# gaussian test vectors are the worst case for IVF (neighbors spread
# across lists, so recall ~ tracks probed fraction); a real corpus with
# cluster structure gets the same recall at a much smaller n_probe/n_lists
# ratio — n_lists grows with corpus size, the ratio is per-deployment.
N_PROBE = 10

# K-means needs ~1000 points per centroid, not the corpus: index TRAINING
# fits on a deterministic hash-gate sample of at most this many rows,
# coalesced to a few partitions so each Lloyd iteration is a couple of
# tasks instead of one per corpus partition (at local test scale that
# per-iteration scheduling overhead — 9 sequential fits x 10 iterations x
# 32 tiny tasks — dominated the whole IVF-PQ build). Assignment/encode
# passes still run over the FULL corpus.
KMEANS_TRAIN_SAMPLE = 100_000


def _training_sample(vecs: DataFrame, id_col: str, target: int = KMEANS_TRAIN_SAMPLE):
    """Deterministic (hash-gated, seed-free) training sample: ≤ ~target
    rows, one distributed filter job."""
    n = vecs.count()
    if n > target:
        denom = -(-n // target)
        vecs = vecs.filter(F.pmod(F.hash(F.col(id_col)), F.lit(denom)) == 0)
    return vecs


def _collect_training_matrix(
    e: DataFrame, id_col: str, vec_col: str, target: int = KMEANS_TRAIN_SAMPLE
):
    """Sample → driver numpy matrix. Bounded: target x dim doubles (100k x
    64 ≈ 50 MB) regardless of corpus size — the FAISS model, where codebook
    / coarse-quantizer TRAINING is single-node work over a sample and only
    assignment/encode passes touch the full corpus distributed."""
    import numpy as np

    pdf = _training_sample(e.select(F.col(vec_col)), id_col, target).toPandas()
    return np.stack(pdf[vec_col].to_numpy()).astype(np.float64)


def _kmeans_numpy(X, k: int, seed: int, max_iter: int = 10):
    """Seeded Lloyd's k-means (k-means++ init) on a driver-resident sample.
    Distance via the ||x-c||^2 expansion: O(n*k) memory, never n*k*dim.
    Empty clusters re-seed to the farthest point (deterministic)."""
    import numpy as np

    n = X.shape[0]
    k = min(k, n)
    rng = np.random.RandomState(seed)
    xnorm = (X * X).sum(axis=1)
    # k-means++ seeding
    idx = [int(rng.randint(n))]
    d2 = xnorm - 2.0 * X @ X[idx[-1]] + xnorm[idx[-1]]
    d2 = np.maximum(d2, 0.0)
    for _ in range(1, k):
        tot = d2.sum()
        if tot <= 0:
            idx.append(int(rng.randint(n)))
        else:
            idx.append(int(rng.choice(n, p=d2 / tot)))
        nd = xnorm - 2.0 * X @ X[idx[-1]] + xnorm[idx[-1]]
        d2 = np.minimum(d2, np.maximum(nd, 0.0))
    C = X[idx].copy()
    for _ in range(max_iter):
        d = -2.0 * X @ C.T + (C * C).sum(axis=1)  # + xnorm is rank-constant
        a = d.argmin(axis=1)
        newC = C.copy()
        for j in range(k):
            mask = a == j
            if mask.any():
                newC[j] = X[mask].mean(axis=0)
            else:
                newC[j] = X[int(d.min(axis=1).argmax())]
        if np.allclose(newC, C):
            C = newC
            break
        C = newC
    return C

# Product quantization: M subspaces x K centroids each. At this test scale
# (500 x dim-64 gaussian vectors) 8x16 keeps codebooks trainable; production
# is M=dim/4..dim/2 subspaces x K=256 (one byte per subspace). The scale
# story PQ buys: the search index stores M small ints per vector instead of
# `dim` floats (here 64 floats -> 8 codes, a 16-32x shrink), and query-time
# scoring touches ONLY codes + a per-query M*K lookup table — raw vectors
# are read again just for the final refine of a few hundred candidates.
PQ_M = 8
PQ_K = 16
# IVF-PQ probes more lists than plain IVF at the same recall target: ADC
# ranking loses a few true neighbors even inside a probed list, so the
# probe stage has to over-cover. Round-8 sweep (sf0.1, refine=32):
# recall@10 0.76 at 10 probes, 0.86 at 12 — search_s flat (code scan is
# cheap; the refine window dominates).
PQ_N_PROBE = 12


def ivf_assignments(
    emb: DataFrame,
    n_lists: int = N_LISTS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF coarse quantizer: seeded k-means over the corpus; returns
    (assignments DataFrame (id, list_id), centroids DataFrame (list_id,
    center array<double>)).

    At 100 TB: centroids train driver-side on a bounded sample
    (_collect_training_matrix — the FAISS split of train-small /
    assign-big), the assignment pass is one Arrow-batched map-only job,
    and ``list_id`` becomes the partition/bucketing key — a query touches
    n_probe partitions instead of the corpus (same storage story as the
    LSH buckets, but data-adaptive, so it keeps selectivity on clustered
    real-world embeddings where random hyperplanes waste tables).
    """
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    X = _collect_training_matrix(e, id_col, "v")
    C = _kmeans_numpy(X, n_lists, IVF_SEED)
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(C)],
        "list_id int, center array<double>",
    )
    return assign_lists(emb, centroids, id_col, vec_col), centroids


def assign_lists(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared-L2 argmin) for a
    GIVEN coarse quantizer — the map-only full-corpus half of the FAISS
    split, factored out so incremental index maintenance (streaming
    arrivals assigned against frozen centroids) and the one-shot build
    share one definition. ``centroids`` is O(n_lists) rows — a driver
    collect here is metadata, not data."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    rows = sorted(
        (r["list_id"], r["center"]) for r in centroids.collect()
    )
    C = np.array([c for _, c in rows], dtype=np.float64)
    ids = np.array([i for i, _ in rows], dtype=np.int32)
    cnorm = (C * C).sum(axis=1)

    @pandas_udf("int")
    def nearest_list(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64)
        d = -2.0 * x @ C.T + cnorm  # ||x||^2 is rank-constant per row
        return pd.Series(ids[d.argmin(axis=1)])

    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    return e.select(F.col(id_col), nearest_list("v").alias("list_id"))


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int,
    n_lists: int = N_LISTS,
    n_probe: int = N_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-ANN: per query, pick the n_probe nearest centroids (cosine), take
    all vectors assigned to those lists as candidates, exact-rerank. The
    centroid table is O(n_lists) and broadcast; the only big-side work is
    the candidate fetch keyed by list_id.

    ``assignments``/``centroids`` inject a prebuilt (persisted) index — the
    production serving split, and how the bench attributes build vs search
    time; omitted, the index is built inline (one-shot convenience)."""
    if assignments is None or centroids is None:
        assignments, centroids = ivf_assignments(emb, n_lists, id_col, vec_col)
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col("v").alias("qv")
    )
    probe_w = W.partitionBy("q_id").orderBy(
        F.desc("c_cos"), F.asc("list_id")
    )
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(centroids))
        .select(
            "q_id",
            "list_id",
            F.round(cosine(F.col("qv"), F.col("center")), 6).alias("c_cos"),
        )
        .withColumn("_r", F.row_number().over(probe_w))
        .filter(F.col("_r") <= n_probe)
        .select("q_id", "list_id")
    )
    cand = (
        F.broadcast(probes)
        .join(assignments, "list_id")
        .filter(F.col(id_col) != F.col("q_id"))
        .select("q_id", F.col(id_col).alias("neighbor_id"))
        .distinct()
    )
    qv = e.select(F.col(id_col).alias("q_id"), F.col("v").alias("qv"))
    nv = e.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("nv"))
    scored = (
        cand.join(F.broadcast(qv), "q_id")
        .join(nv, "neighbor_id")
        .select(
            "q_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cosine", "rank")
    )


def ivf_probe_curve(
    emb: DataFrame,
    sample_ids: list[int],
    k: int,
    assignments: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, float]]:
    """Recall@k as a function of n_probe, measured on a held-out query
    sample against the PREBUILT index — the whole curve from ONE plan.

    For each (held-out query, exact top-k neighbor) pair, compute the
    centroid-cosine RANK of the list the neighbor is assigned to; recall
    at probe depth p is simply the fraction of pairs with rank <= p, so
    a single join + a <=n_lists-row histogram replaces n_lists separate
    searches.  Everything query-sided is broadcast (sample x n_lists);
    the only corpus-sized work is the exact ground-truth top-k over the
    sample, which is the price of measuring recall at all.  Returns
    [(p, recall)] for p = 1..n_lists, monotone nondecreasing."""
    gt = brute_force_topk(emb, sample_ids, k, id_col, vec_col)
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    q = e.filter(F.col(id_col).isin(sample_ids)).select(
        F.col(id_col).alias("q_id"), F.col("v").alias("qv")
    )
    rank_w = W.partitionBy("q_id").orderBy(F.desc("c_cos"), F.asc("list_id"))
    list_rank = (
        F.broadcast(q)
        .crossJoin(F.broadcast(centroids))
        .select(
            "q_id",
            "list_id",
            F.round(cosine(F.col("qv"), F.col("center")), 6).alias("c_cos"),
        )
        .withColumn("list_rank", F.row_number().over(rank_w))
        .select("q_id", "list_id", "list_rank")
    )
    neighbor_list = assignments.select(
        F.col(id_col).alias("neighbor_id"), "list_id"
    )
    hist_rows = (
        gt.join(neighbor_list, "neighbor_id")
        .join(F.broadcast(list_rank), ["q_id", "list_id"])
        .groupBy("list_rank")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    n_lists = centroids.count()
    total = len(sample_ids) * k
    hist = {int(r.list_rank): int(r.n) for r in hist_rows}
    curve: list[tuple[int, float]] = []
    seen = 0
    for p in range(1, n_lists + 1):
        seen += hist.get(p, 0)
        curve.append((p, seen / total if total else 0.0))
    return curve


def tune_n_probe(
    emb: DataFrame,
    target_recall: float,
    k: int,
    sample_size: int = 32,
    n_lists: int = N_LISTS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> tuple[int, float, list[tuple[int, float]]]:
    """Target-recall probe selection at build time (VERDICT r12 #9): pick
    the SMALLEST n_probe whose measured recall@k on a deterministic
    hash-gated held-out sample meets ``target_recall``.  Returns
    (n_probe, achieved_recall, full_curve); if even probing every list
    misses the target (ground-truth ties straddling rounding), the full
    scan n_probe = n_lists is returned with its achieved recall —
    tuning never silently exceeds the index's own ceiling."""
    if assignments is None or centroids is None:
        assignments, centroids = ivf_assignments(emb, n_lists, id_col, vec_col)
    n = emb.count()
    denom = max(1, n // sample_size)
    sample_ids = [
        int(r[0])
        for r in emb.select(id_col)
        .filter(F.pmod(F.hash(F.col(id_col)), F.lit(denom)) == 0)
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    ]
    curve = ivf_probe_curve(
        emb, sample_ids, k, assignments, centroids, id_col, vec_col
    )
    for p, r in curve:
        if r >= target_recall:
            return p, r, curve
    return curve[-1][0], curve[-1][1], curve


def _l2_normalize(e: DataFrame, vec: str = "v") -> DataFrame:
    """Divide each vector by its L2 norm (zero vectors dropped). After this,
    inner product == cosine, so PQ's additive dot-product approximation
    ranks by cosine directly."""
    nrm = F.sqrt(dot(F.col(vec), F.col(vec)))
    return (
        e.filter(nrm > 0)
        .withColumn(vec, F.transform(F.col(vec), lambda x: x / nrm))
    )


OPQ_ITERS = 8


def pq_training_matrix(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The L2-normalized driver training sample shared by OPQ rotation
    training and PQ codebook training. Factored out (r19): opq_rotation
    and pq_codebooks each collected this exact matrix themselves, so an
    IVF-PQ build paid the sample count + collect twice — pass the result
    through ``sample_X`` to both and the corpus is scanned once for all
    PQ training. Same expression tree as before, so the shared matrix is
    bit-identical to what each trainer collected on its own (rotation,
    codebooks, codes, and therefore search results are unchanged)."""
    e = _l2_normalize(
        emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    )
    return _collect_training_matrix(e, id_col, "v")


def opq_rotation(
    emb: DataFrame,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = OPQ_ITERS,
    sample_X=None,
) -> list[list[float]]:
    """Non-parametric OPQ rotation (Ge et al., "Optimized Product
    Quantization", CVPR 2013 §4; the FAISS ``OPQMatrix`` training loop):
    alternate (a) per-subspace k-means codebooks on the rotated sample
    and (b) the orthogonal Procrustes solve ``R = argmin ||X R - Y||_F
    = U V^T from svd(X^T Y)`` against the codebook reconstruction Y.
    Each half-step is the exact minimizer of the shared quantization
    MSE, so the objective is monotonically non-increasing (the property
    tests/test_operators.py pins).  Applied as ``x @ R.T``; R is
    orthogonal, so norms, inner products, and therefore the exact
    refine stage are untouched.

    Train-small/assign-big (the IVF discipline): the alternation runs
    on the SAME driver sample the codebooks train on; the dim x dim
    matrix (64x64 here, 1024x1024 in production) is a trivially
    broadcastable closure constant for the encode pass.

    Measured on this repo's corpus (BASELINE.md round 12): quantization
    MSE 0.582 -> 0.542 and ADC-shortlist recall@10 0.595 -> 0.675 at
    refine=100; on a planted axis-aligned anisotropic fixture the lift
    is 0.505 -> 0.905."""
    import numpy as np

    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    sub = dim // m
    X = (
        sample_X
        if sample_X is not None
        else pq_training_matrix(emb, id_col, vec_col)
    )
    M = np.eye(dim)  # apply convention: rotated = X @ M
    for _ in range(iters):
        Xr = X @ M
        books = [
            _kmeans_numpy(Xr[:, s * sub : (s + 1) * sub], k, IVF_SEED + s)
            for s in range(m)
        ]
        Y = np.empty_like(Xr)
        for s in range(m):
            seg = Xr[:, s * sub : (s + 1) * sub]
            C = np.asarray(books[s])
            d = (
                (seg * seg).sum(axis=1, keepdims=True)
                - 2.0 * seg @ C.T
                + (C * C).sum(axis=1)
            )
            Y[:, s * sub : (s + 1) * sub] = C[d.argmin(axis=1)]
        U, _S, Vt = np.linalg.svd(X.T @ Y)
        M = U @ Vt
    R = M.T  # x @ R.T == x @ M
    return [[float(x) for x in row] for row in R]


def pq_quantization_mse(
    emb: DataFrame,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: list[list[float]] | None = None,
) -> float:
    """Mean squared reconstruction error of the (rotation, codebooks)
    pair on the training sample — OPQ's actual objective, exposed for
    the monotone-improvement property test."""
    import numpy as np

    sub = dim // m
    e = _l2_normalize(
        emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    )
    X = _collect_training_matrix(e, id_col, "v")
    if rotation is not None:
        X = X @ np.asarray(rotation, dtype=np.float64).T
    err = 0.0
    for s in range(m):
        seg = X[:, s * sub : (s + 1) * sub]
        C = np.asarray(
            _kmeans_numpy(seg, k, IVF_SEED + s), dtype=np.float64
        )
        d = (
            (seg * seg).sum(axis=1, keepdims=True)
            - 2.0 * seg @ C.T
            + (C * C).sum(axis=1)
        )
        err += float(d.min(axis=1).mean())
    return err


def pq_codebooks(
    emb: DataFrame,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: list[list[float]] | None = None,
    sample_X=None,
) -> list[list[list[float]]]:
    """Train per-subspace k-means codebooks on L2-normalized vectors.

    Returns ``books[sub][j] = centroid`` (m x k x dim/m floats — tiny:
    production 16x256x32 is ~0.5 MB, always broadcastable). Training is
    driver-side numpy k-means over ONE collected sample sliced per
    subspace (k-means needs ~1000*k points per subspace, not the corpus;
    8 sequential MLlib fits cost ~2 s of job-scheduling overhead EACH at
    any data size) — the distributed full pass is only the encode step.
    """
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    sub = dim // m
    # one sample collect feeds all m subspace fits — the corpus is scanned
    # once for training no matter how many subspaces (and not at all when
    # the caller shares a pq_training_matrix via sample_X)
    X = (
        sample_X
        if sample_X is not None
        else pq_training_matrix(emb, id_col, vec_col)
    )
    if rotation is not None:
        import numpy as np

        X = X @ np.asarray(rotation, dtype=np.float64).T
    books: list[list[list[float]]] = []
    for s in range(m):
        C = _kmeans_numpy(X[:, s * sub : (s + 1) * sub], k, IVF_SEED + s)
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_encode(
    emb: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """(id, codes array<int>) — nearest codebook entry per subspace.

    One Arrow-batched map pass over the corpus (no shuffle, no join): numpy
    computes the (batch, k) distance matrix per subspace via the
    ||x-c||^2 = ||x||^2 - 2x.c + ||c||^2 expansion, argmin ties to the
    lowest index (deterministic). JVM expressions would need m*k unrolled
    aggregate() trees per row — at production k=256 that is exactly the
    workload pandas_udf exists for.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    m = len(books)
    sub = len(books[0][0])
    cents = [np.asarray(b, dtype=np.float64) for b in books]  # m x (k, sub)
    cnorms = [(c * c).sum(axis=1) for c in cents]
    R = None if rotation is None else np.asarray(rotation, dtype=np.float64)

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy())  # (batch, dim), already normalized
        if R is not None:
            x = x @ R.T  # orthogonal: norms/cosines preserved
        codes = np.empty((x.shape[0], m), dtype=np.int32)
        for s in range(m):
            xs = x[:, s * sub : (s + 1) * sub]
            # (batch, k): -2*x.c + ||c||^2 (||x||^2 is rank-constant)
            d = -2.0 * xs @ cents[s].T + cnorms[s]
            codes[:, s] = d.argmin(axis=1)
        return pd.Series(list(codes))

    e = _l2_normalize(
        emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    )
    return e.select(F.col(id_col), encode("v").alias("codes"))


def ivfpq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int,
    dim: int,
    n_lists: int = N_LISTS,
    n_probe: int = PQ_N_PROBE,
    m: int = PQ_M,
    pq_k: int = PQ_K,
    # 48*k ADC survivors re-ranked exactly (round-12 retune; 32*k measured
    # recall 0.82-0.84, 48*k hits the 0.88 IVF-probe ceiling at flat
    # search_s) — the refine list is per-query rows, so widening it is
    # nearly free next to the code scan.
    refine: int = 48,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
    assignments: DataFrame | None = None,
    centroids: DataFrame | None = None,
    codes: DataFrame | None = None,
    rotation: list[list[float]] | None = None,
    sample_X=None,
) -> DataFrame:
    """IVF-PQ ANN (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011): IVF prunes the corpus to n_probe lists, asymmetric
    distance (ADC) scores candidates from their m-byte codes alone, and an
    exact refine re-ranks the top refine*k ADC survivors per query.

    ``books``/``assignments``/``centroids``/``codes`` inject a prebuilt
    index (the serving split; lets the bench time build vs search);
    omitted, the index builds inline.

    Per stage at 100 TB:
    - index = (id, list_id, codes): built once, bucketed by list_id; the
      scan that serves queries reads codes, never the raw vectors.
    - the per-query lookup table (m x pq_k partial dots) is tiny and rides
      a broadcast join; ADC itself is one JVM `aggregate` over the codes
      array with `element_at` into the table — zero Python per candidate.
    - only refine*k rows per query ever touch raw vectors again.
    """
    sub = dim // m
    if books is None:
        books = pq_codebooks(
            emb, dim, m, pq_k, id_col, vec_col, rotation, sample_X=sample_X
        )
    if assignments is None or centroids is None:
        assignments, centroids = ivf_assignments(emb, n_lists, id_col, vec_col)
    if codes is None:
        codes = pq_encode(emb, books, id_col, vec_col, rotation)
    index = assignments.join(codes, id_col)

    spark = emb.sparkSession
    e = _l2_normalize(
        emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    )
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col("v").alias("qv")
    )
    if rotation is not None:
        # the ADC lookup table must slice the ROTATED query (codes live in
        # rotated space); probes and refine keep the original vectors —
        # IVF centroids are unrotated and R preserves exact cosine.
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        _R = np.asarray(rotation, dtype=np.float64)

        @pandas_udf("array<double>")
        def _rot(v: pd.Series) -> pd.Series:
            x = np.stack(v.to_numpy()) @ _R.T
            return pd.Series(list(x))

        q = q.withColumn("qv_lut", _rot("qv"))
    else:
        q = q.withColumn("qv_lut", F.col("qv"))

    # Per-query ADC lookup table: lut[s*pq_k + j] = dot(q_sub_s, books[s][j]).
    book_rows = [
        (s, j, books[s][j]) for s in range(m) for j in range(pq_k)
    ]
    book_df = spark.createDataFrame(book_rows, "s int, j int, c array<double>")
    lut = (
        F.broadcast(q)
        .crossJoin(F.broadcast(book_df))
        .select(
            "q_id",
            (F.col("s") * pq_k + F.col("j")).alias("slot"),
            dot(
                F.slice("qv_lut", F.col("s") * sub + 1, sub), F.col("c")
            ).alias("pd"),
        )
        .groupBy("q_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("slot", "pd"))),
                lambda x: x["pd"],
            ).alias("lut")
        )
    )

    # IVF probe selection (same as ivf_topk): n_probe nearest centroids.
    probe_w = W.partitionBy("q_id").orderBy(F.desc("c_cos"), F.asc("list_id"))
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(centroids))
        .select(
            "q_id",
            "list_id",
            F.round(cosine(F.col("qv"), F.col("center")), 6).alias("c_cos"),
        )
        .withColumn("_r", F.row_number().over(probe_w))
        .filter(F.col("_r") <= n_probe)
        .select("q_id", "list_id")
    )

    # ADC over codes only: approx_dot = sum_s lut[s*pq_k + codes[s]].
    adc = (
        F.broadcast(probes)
        .join(index, "list_id")
        .filter(F.col(id_col) != F.col("q_id"))
        .join(F.broadcast(lut), "q_id")
        .select(
            "q_id",
            F.col(id_col).alias("neighbor_id"),
            F.aggregate(
                F.zip_with(
                    "codes",
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda c, s: F.element_at("lut", s * pq_k + c + 1),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("approx_dot"),
        )
    )
    aw = W.partitionBy("q_id").orderBy(F.desc("approx_dot"), F.asc("neighbor_id"))
    shortlist = (
        adc.withColumn("_r", F.row_number().over(aw))
        .filter(F.col("_r") <= refine * k)
        .select("q_id", "neighbor_id")
    )

    # Exact refine: only refine*k rows per query read raw vectors.
    qv = e.select(F.col(id_col).alias("q_id"), F.col("v").alias("qv"))
    nv = e.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("nv"))
    scored = (
        shortlist.join(F.broadcast(qv), "q_id")
        .join(nv, "neighbor_id")
        .select(
            "q_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cosine", "rank")
    )


def semdedup(
    emb: DataFrame,
    threshold: float,
    n_lists: int = N_LISTS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup scoped to
    embedding clusters. K-means the corpus (the IVF coarse quantizer
    reused), compare vectors only WITHIN their cluster, connect pairs with
    rounded cosine >= threshold, and keep the minimum id per connected
    component as canonical.

    Scale shape: the candidate join is keyed on ``list_id`` — cost is
    sum(|cluster|^2), never corpus^2, and the paper's knob applies
    directly: grow n_lists with the corpus so clusters stay bounded (their
    setting: 110 M docs / 50 k clusters). Cross-cluster near-dups are
    missed BY DESIGN — that approximation is the algorithm. Components run
    per cluster (pairs never cross lists), so the fixpoint converges in the
    same O(log^2 max_cluster) rounds.

    Returns one row per vector:
    ``(id, list_id, sem_cluster, is_canonical)`` where ``sem_cluster`` is
    the min id of the duplicate component (own id for singletons).
    """
    from pasardassist_spark.operators.components import connected_components

    assignments, _ = ivf_assignments(emb, n_lists, id_col, vec_col)
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v")).join(
        assignments, id_col
    )
    a = e.select(F.col(id_col).alias("id_a"), "list_id", F.col("v").alias("va"))
    b = e.select(F.col(id_col).alias("id_b"), "list_id", F.col("v").alias("vb"))
    pairs = (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    comp = connected_components(pairs, "id_a", "id_b")
    return (
        assignments.join(
            comp.withColumnRenamed("node", id_col), id_col, "left"
        )
        .select(
            F.col(id_col),
            "list_id",
            F.coalesce("component", F.col(id_col)).alias("sem_cluster"),
            (F.coalesce("component", F.col(id_col)) == F.col(id_col)).alias(
                "is_canonical"
            ),
        )
    )


def mine_hard_negatives(
    emb: DataFrame,
    k: int = 5,
    n_lists: int = N_LISTS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    assignments: DataFrame | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR/SimCSE data
    prep): for each anchor, the k most-cosine-similar vectors carrying a
    DIFFERENT label, drawn from the anchor's IVF list — the negatives
    near the decision boundary that make a contrastive batch informative
    (random negatives are trivially easy; same-label neighbors are
    positives, excluded in the join condition, so a mislabeled near-dup
    can never be emitted as a negative).

    Scale shape shared with semdedup: candidates are same-list pairs, so
    the cost is sum(|list|^2) over lists — never corpus^2 — and list_id
    is the shuffle key. Per-anchor top-k is a WindowGroupLimit over the
    candidate stream. Returns (anchor id, neg id, anchor label, neg
    label, cosine, rank) with rank 1..<=k per anchor; anchors whose list
    has no opposite-label vector yield no rows (mine with more lists
    probed upstream if that matters).
    """
    if assignments is None:
        assignments, _ = ivf_assignments(emb, n_lists, id_col, vec_col)
    # L2 norm precomputed ONCE per row — inside the pair loop a naive
    # cosine() would recompute both norms per candidate pair, tripling
    # the dominant HOF cost
    norm = F.sqrt(
        F.aggregate(
            F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    # persist (r18): ``e`` feeds BOTH sides of the same-list candidate
    # self-join — unstaged, the scan + ArrowEvalPython list assignment +
    # HOF norm ran twice. O(N) rows; hygiene via session clearCache.
    e = (
        emb.select(
            F.col(id_col), as_double(F.col(vec_col)).alias("v"), F.col(label_col)
        )
        .join(assignments, id_col)
        .withColumn("nrm", norm)
        .persist()
    )
    a = e.select(
        F.col(id_col).alias("anchor_id"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        F.col(label_col).alias("anchor_label"),
        "list_id",
    )
    b = e.select(
        F.col(id_col).alias("neg_id"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        F.col(label_col).alias("neg_label"),
        "list_id",
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        a.join(b, "list_id")
        .filter(F.col("anchor_label") != F.col("neg_label"))
        .select(
            "anchor_id",
            "neg_id",
            "anchor_label",
            "neg_label",
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("anchor_id").orderBy(F.desc("cosine"), F.asc("neg_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
