"""Deterministic global shuffle-sharding for training-data export.

Every training run starts from a globally shuffled corpus cut into N
shard files. The naive implementation — ``ORDER BY rand()`` — is a
single global sort seeded by a nondeterministic expression: one
corpus-wide exchange whose result changes under retries and
re-partitioning (Spark re-evaluates ``rand()`` per task attempt). The
scale-and-reproducibility-correct shape is a SEEDED HASH PERMUTATION
(the reference has no export stage at all; its closest artifact is the
paged Mongo scan, reference src/modules/database/db.service.ts — an
inherently ordered, single-cursor layout that cannot shuffle):

- ``shard  = pmod(xxhash64(seed, id), n_shards)`` — a pure function of
  the row identity, so assignment is reproducible across runs, retries,
  cluster sizes, and input layouts, and shard sizes concentrate tightly
  around n/N (multiplicative Chernoff: the planted-key pathologies of
  data-dependent keys don't exist for a keyed hash of a UNIQUE id);
- ``shard_pos = row_number() over (partition by shard order by
  xxhash64(seed+1, id), id)`` — an independent second hash orders rows
  WITHIN each shard, so intra-shard order is also a seeded permutation,
  not input order leaking through. The sort is per-shard (parallel,
  n/N rows each), never global.

Cost: ONE hash-partitioned exchange + per-shard local sort — the
theoretical minimum for a materialized permutation. Different ``seed``
⇒ an unrelated permutation (new data order per training run); same seed
⇒ byte-identical shards, which is what makes training reproducible and
shard-level resume safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int,
    pos_col: str = "shard_pos",
    shard_col: str = "shard",
) -> DataFrame:
    """Assign every row a ``(shard, shard_pos)`` coordinate forming a
    seeded pseudo-random global permutation (see module docstring).

    ``id_col`` must be unique and non-null — it is the permutation's
    domain; duplicates would collide to adjacent positions rather than
    error. Deterministic under any input partitioning: tests pin that a
    ``repartition`` of the input yields identical coordinates.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if shard_col in df.columns or pos_col in df.columns:
        raise ValueError(f"{shard_col!r}/{pos_col!r} collide with input columns")
    shard = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(n_shards))
    order = F.xxhash64(F.lit(seed + 1), F.col(id_col))
    w = W.partitionBy(shard_col).orderBy(order, F.col(id_col))
    return (
        df.withColumn(shard_col, shard.cast("int"))
        .withColumn(pos_col, (F.row_number().over(w) - 1).cast("long"))
    )


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int,
) -> None:
    """Materialize the shuffled corpus as one directory per shard
    (``shard=K/``), rows laid down in ``shard_pos`` order — the layout a
    training loader consumes sequentially. ``repartition(shard)`` aligns
    files 1:1 with shards so each shard is one writer task's output, and
    ``sortWithinPartitions`` makes row order inside the file the
    permutation order (parquet preserves task-local write order)."""
    out = shuffle_shards(df, id_col, n_shards, seed)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
