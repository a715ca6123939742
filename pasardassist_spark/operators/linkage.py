"""Record linkage / entity resolution — the MDM composite: blocked fuzzy
matching → transitive clustering → survivorship.

The reference maintains entity tables by exact natural keys
(reference src/modules/database/db.service.ts:154-160); real ingested
entity data (user profiles, collection names) arrives with typos and
format drift, and the standard cure is the three-stage pipeline this
module composes from existing operators:

1. **candidate pairs** — lossless length-band blocking + thresholded
   levenshtein (operators/rangejoin.py:band_self_join with carry, the
   dedup_fuzzy_levenshtein shape): same-block pairs within edit distance
   ``max_dist``, never a cross join;
2. **transitive closure** — pairwise matches are not clusters ("acme
   corp" ~ "acme corp." ~ "acme  corp." chains where the ends do NOT
   match each other); large-star/small-star connected components
   (operators/components.py) resolve chains in O(log² n) rounds;
3. **survivorship** — one canonical row per cluster by a deterministic
   total order (argmax over a caller-supplied sort-key struct, the
   latest_per_key discipline), everything else marked with its cluster.

Each stage is the already-scale-proven operator; this module only wires
them, so the 100 TB story (shuffle keys: (block, length-bucket) →
edge-partitioned star rounds → cluster id) is inherited, not new.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from pasardassist_spark.operators.components import connected_components
from pasardassist_spark.operators.rangejoin import band_self_join


def fuzzy_pairs(
    df: DataFrame,
    block_keys: Sequence[str],
    id_col: str,
    text_col: str,
    max_dist: int,
) -> DataFrame:
    """Stage 1: candidate pairs (id_a, id_b, dist) within ``max_dist``
    edits, same block. Blocking is lossless (levenshtein >= |len diff|):
    every qualifying pair inside a block is found."""
    if max_dist < 1:
        raise ValueError(
            f"max_dist must be >= 1 (got {max_dist}); distance 0 is exact "
            "equality — use exact dedup, not fuzzy matching"
        )
    cand = band_self_join(
        df.withColumn("_len", F.length(text_col)),
        keys=list(block_keys),
        id_col=id_col,
        value_col="_len",
        eps=float(max_dist),
        carry=[text_col],
    )
    dist = F.levenshtein(
        F.col(f"{text_col}_a"), F.col(f"{text_col}_b"), threshold=max_dist
    )
    return (
        cand.select("id_a", "id_b", dist.alias("dist"))
        .filter(F.col("dist") >= 0)
    )


def link_records(
    df: DataFrame,
    block_keys: Sequence[str],
    id_col: str,
    text_col: str,
    max_dist: int,
    survivor_order: Sequence[Column] | None = None,
) -> DataFrame:
    """The full linkage pipeline. Returns ``df`` plus:

    - ``cluster_id`` — the minimum member id of the record's transitive
      match cluster (its own id for singletons): deterministic under any
      partitioning;
    - ``is_canonical`` — true on exactly one row per cluster, the argmax
      of ``survivor_order`` (default: lowest id wins; pass e.g.
      ``[F.col("updated_at")]`` for latest-wins survivorship — ties
      always fall to the lowest NUMERIC id, which is also why ``id_col``
      must be numeric).

    Matching is WITHIN blocks (blocked-pairs contract); records in
    different blocks are never linked — pick ``block_keys`` accordingly.

    The quadratic stage runs over distinct (block, text) TYPES, not
    records: records sharing a type are linked at distance 0 by
    construction, so the record graph collapses losslessly to
    member→representative edges plus fuzzy edges between type
    representatives — the standard exact-collapse-before-fuzzy
    optimization (semantics identical: any qualifying record pair's
    types form a qualifying type pair or ARE one type). On duplicated
    corpora the candidate-pair count drops by the square of the
    duplication factor (TPC-H sf0.1 parts: 20 000 rows → 1 600 types,
    ~156x fewer comparisons).
    """
    keys = list(block_keys)
    # persist (r18): ``types`` feeds both sides of the fuzzy band
    # self-join plus the member-edge join — unstaged, the type-collapse
    # groupBy re-ran 3x. O(types) rows (the collapse's whole point is
    # types << records). Cache hygiene is the session owner's clearCache.
    types = (
        df.groupBy(*keys, text_col).agg(F.min(id_col).alias("_rep")).persist()
    )
    rep_pairs = fuzzy_pairs(types, keys, "_rep", text_col, max_dist).select(
        "id_a", "id_b"
    )
    member_edges = (
        df.join(types, [*keys, text_col])
        .filter(F.col(id_col) != F.col("_rep"))
        .select(F.col(id_col).alias("id_a"), F.col("_rep").alias("id_b"))
    )
    comp = connected_components(
        rep_pairs.unionByName(member_edges), "id_a", "id_b"
    ).withColumnRenamed("node", id_col)
    # NOT persisted (r18): ``out`` feeds the survivorship aggregate and
    # the winners join, but persisting it was A/B-measured SLOWER at both
    # 32 and 8 cores (+13-16%) — the staged frame materializes the full
    # payload width (df's text columns), defeating the per-consumer
    # column pruning that makes the double evaluation cheap. The
    # components input is checkpoint-backed, so the re-run is two narrow
    # joins, not a re-derivation.
    out = df.join(comp, id_col, "left").withColumn(
        "cluster_id", F.coalesce("component", F.col(id_col))
    ).drop("component")
    order = list(survivor_order) if survivor_order else []
    # max_by over a (survivor_order..., -id)-shaped struct: one shuffle on
    # cluster_id, no window sort of the full table
    tiebreak = -F.col(id_col)
    key_struct = F.struct(*order, tiebreak.alias("_neg_id"))
    winners = out.groupBy("cluster_id").agg(
        F.max_by(F.col(id_col), key_struct).alias("_win")
    )
    # winners is O(clusters) — same magnitude as the table; a plain
    # cluster_id equi-join (co-partitioned with the groupBy above) is the
    # scale-correct shape, NOT a broadcast
    return (
        out.join(winners, "cluster_id")
        .withColumn("is_canonical", F.col(id_col) == F.col("_win"))
        .drop("_win")
    )
