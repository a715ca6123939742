"""sf0.1 -> 10x scaling rows for the graph shelf's two iterative heavies
(r17 VERDICT #5): graph_pagerank and graph_label_propagation.

Replica design (the round-14 harness pattern): N disjoint copies of the
underlying graph, so edges AND nodes grow Nx while per-replica structure
(degree distribution, community shapes, DF caps) is preserved —
- pagerank: lineitem+orders replicated with per-replica key offsets on
  (l_orderkey/o_orderkey, o_custkey, l_suppkey), giving N disjoint
  bipartite trade graphs;
- LPA: documents replicated with doc_id offsets AND every token tagged
  with a replica suffix (regexp on \\S+), so shingle spaces are disjoint
  across replicas and each copy's DF-capped edge set equals the
  original's (untagged replication would instead multiply every
  shingle's corpus DF by N and blow through the [2, LPA_MAX_GRAM_DF]
  keep-band — a different graph, not a bigger one).

Both queries run IDENTICAL code at both scales (REGISTRY fns over the
replica dirs); iteration counts are the fixed production constants
(PR_ITERS=3, LPA_ROUNDS=5). min-of-2 per point, 1x also routed through
the replication writer so both points share fixture shape.

Run (idle host): PYTHONPATH=/root/repo python tools/round18_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from pasardassist_spark import get_spark
from pasardassist_spark.queries.registry import REGISTRY, _load_all
from pasardassist_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFF = 100_000_000


def _reps(spark, n):
    return F.broadcast(spark.range(n).select(F.col("id").alias("_rep")))


def build_trade(spark, n: int) -> str:
    """lineitem+orders (graph columns only) as n disjoint trade graphs."""
    base = tempfile.mkdtemp(prefix=f"r18_trade{n}_")
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = (
        li.crossJoin(_reps(spark, n))
        .select(
            (F.col("l_orderkey") + F.col("_rep") * OFF).alias("l_orderkey"),
            (F.col("l_suppkey") + F.col("_rep") * OFF).alias("l_suppkey"),
        )
    )
    o = (
        o.crossJoin(_reps(spark, n))
        .select(
            (F.col("o_orderkey") + F.col("_rep") * OFF).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("_rep") * OFF).alias("o_custkey"),
        )
    )
    li.write.mode("overwrite").parquet(os.path.join(base, "lineitem.parquet"))
    o.write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))
    return base


def build_docs(spark, n: int) -> str:
    """documents as n shingle-disjoint copies (token-tagged per replica)."""
    base = tempfile.mkdtemp(prefix=f"r18_docs{n}_")
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    # two-step tag: Java-regex replacement strings don't interpolate
    # columns, so mark every token with a fixed "@R" suffix, then swap
    # the marker for the replica id with a column-replacement regex
    rep = d.crossJoin(_reps(spark, n)).select(
        (F.col("doc_id") + F.col("_rep") * OFF).alias("doc_id"),
        F.regexp_replace(
            F.regexp_replace("text", r"(\S+)", r"$1@R"),
            F.lit("@R"),
            F.concat(F.lit("@"), F.col("_rep").cast("string")),
        ).alias("text"),
    )
    rep.write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
    return base


def timed(fn, spark, sf_dir: str, runs: int = 2):
    best, rows = None, 0
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        rows = len(fn(spark, sf_dir).collect())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), rows


def main() -> None:
    spark = get_spark("round18-graph-scale")
    _load_all()
    out = {"sf": SF_DIR, "queries": {}}
    for qname, builder in (
        ("graph_pagerank", build_trade),
        ("graph_label_propagation", build_docs),
    ):
        fn = REGISTRY[qname].fn
        dirs = {}
        try:
            for n in (1, 10):
                dirs[n] = builder(spark, n)
            t1, r1 = timed(fn, spark, dirs[1])
            t10, r10 = timed(fn, spark, dirs[10])
            out["queries"][qname] = {
                "t_1x": t1,
                "t_10x": t10,
                "ratio": round(t10 / t1, 2),
                "rows_1x": r1,
                "rows_10x": r10,
            }
            print(qname, out["queries"][qname], flush=True)
        finally:
            for p in dirs.values():
                shutil.rmtree(p, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
