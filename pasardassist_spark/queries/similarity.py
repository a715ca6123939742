"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pasardassist_spark.operators import similarity as S
from pasardassist_spark.queries.registry import query
from pasardassist_spark.tables import load

QUERY_IDS = [0, 1, 2, 3, 4]
K = 10
DIM = 64


@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e
          WHERE vec_id IN ({", ".join(map(str, QUERY_IDS))})),
    scored AS (
        SELECT q_id, e.vec_id AS neighbor_id,
               round(list_dot_product(qv, v)
                     / sqrt(list_dot_product(qv, qv) * list_dot_product(v, v)),
                     6) AS cosine
        FROM q JOIN e ON e.vec_id <> q_id
    )
    SELECT q_id, neighbor_id, cosine, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank
        FROM scored
    ) WHERE rank <= {K}
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for 5 query vectors — the ANN
    correctness baseline. Query side broadcast; candidate corpus streams
    through one stage (no shuffle of the big side); cosine rounded to 6dp
    before ranking so order is engine-reproducible."""
    emb = load(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, QUERY_IDS, K)


@query("sim_lsh_ann")  # seeded-PRNG hyperplanes are not SQL-portable: rows-only
def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via sign-random-projection LSH (2 tables x 8
    hyperplanes, seed 42): bucket-collision candidates, exact re-rank.
    The scale path: at 100 TB the bucket id is the bucketing/partition key,
    so a query probes ~2 buckets instead of scanning the corpus. Recall vs
    the brute-force baseline is asserted in tests/test_operators.py."""
    emb = load(spark, sf_dir, "embeddings")
    return S.ann_topk(emb, QUERY_IDS, K, DIM)


@query("sim_ivf_ann")  # k-means centroids are not SQL-portable: rows-only
def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVF (seeded k-means coarse quantizer, 16
    lists, probe 4): the data-adaptive counterpart to sim_lsh_ann. At scale
    list_id is the partition key. Recall vs brute force asserted in
    tests/test_operators.py."""
    emb = load(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, QUERY_IDS, K)
