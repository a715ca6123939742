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
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates from LSH bucket collisions, exact
    cosine re-rank on the (small) candidate set.

    Multi-probe: each query also probes the buckets within Hamming distance
    ``probe_radius`` of its own code in every table — the standard recall
    lever that costs extra PROBES (1 + B per table at radius 1), not extra
    tables/storage. On the driver's near-random gaussian vectors this lifts
    expected recall from ~0.18 (exact-bucket) to ~0.65; clustered production
    embeddings saturate toward 1.0. Probing is query-side only: the corpus
    keeps one (table, bucket) row per vector, so the bucket id stays the
    partition key at scale.
    """
    buckets = random_projection_buckets(emb, dim, id_col, vec_col)
    probe_masks = [0]
    if probe_radius >= 1:
        probe_masks += [1 << i for i in range(N_PLANES)]
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
N_PROBE = 4


def ivf_assignments(
    emb: DataFrame,
    n_lists: int = N_LISTS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF coarse quantizer: seeded k-means over the corpus; returns
    (assignments DataFrame (id, list_id), centroids DataFrame (list_id,
    center array<double>)).

    At 100 TB: centroids train on a sample, the assignment pass is one
    map-only job, and ``list_id`` becomes the partition/bucketing key — a
    query touches n_probe partitions instead of the corpus (same storage
    story as the LSH buckets, but data-adaptive, so it keeps selectivity on
    clustered real-world embeddings where random hyperplanes waste tables).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = emb.select(
        F.col(id_col), array_to_vector(as_double(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=n_lists, seed=IVF_SEED, maxIter=10).fit(vecs)
    assignments = model.transform(vecs).select(
        F.col(id_col), F.col("prediction").alias("list_id")
    )
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "list_id int, center array<double>",
    )
    return assignments, centroids


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int,
    n_lists: int = N_LISTS,
    n_probe: int = N_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-ANN: per query, pick the n_probe nearest centroids (cosine), take
    all vectors assigned to those lists as candidates, exact-rerank. The
    centroid table is O(n_lists) and broadcast; the only big-side work is
    the candidate fetch keyed by list_id."""
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
