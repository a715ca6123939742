"""Round-19 item 5: A/B the iterative-graph edge side as a BUCKETED
silver table (bucketBy src, sortBy src — §6 layout, the j2 lesson)
against the in-session repartition+sortWithinPartitions+persist staging
the r18 build landed, at 1x and 10x edges (tools/round18_scale.py
replica fixture).

    PYTHONPATH=/root/repo python tools/r19_bucketed_edges_ab.py [n_rep]

For each scale: build the replica dir once, then time
  persist  — REGISTRY graph_pagerank verbatim (current code), and
  bucketed — the same iteration where the transition frame is written
             once with bucketBy+sortBy into spark-warehouse (write
             timed separately as build_s, the silver-table discipline)
             and each round joins against the bucketed read.
Results are asserted identical. min-of-2 per variant, interleaved.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from pasardassist_spark import get_spark
from pasardassist_spark.caching import release_all
from pasardassist_spark.queries.mining import PR_DAMP, PR_ITERS
from pasardassist_spark.queries.registry import REGISTRY, _load_all
from pasardassist_spark.tables import load
from tools.round18_scale import build_trade


def _edges(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )


def _iterate(trans, deg_count, ranks):
    for _ in range(PR_ITERS):
        ranks = (
            trans.join(ranks, trans.src == ranks.node)
            .groupBy(F.col("dst").alias("node_"))
            .agg(
                (
                    F.lit((1.0 - PR_DAMP) / deg_count)
                    + F.lit(PR_DAMP) * F.sum(F.col("rank") * F.col("p"))
                ).alias("rank")
            )
            .withColumnRenamed("node_", "node")
        )
    return ranks.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c"), F.shiftright("node", 1).cast("string")),
        )
        .otherwise(F.concat(F.lit("s"), F.shiftright("node", 1).cast("string")))
        .alias("node"),
        F.round("rank", 6).alias("rank"),
    )


def pagerank_bucketed(spark, sf_dir: str, table: str, n_buckets: int):
    """Identical math to graph_pagerank; the transition frame is a
    bucketed+sorted catalog table instead of an in-memory persist.
    Returns (result_df, build_s)."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    t0 = time.perf_counter()
    (
        edges.join(deg, "src")
        .select("src", "dst", (F.col("w") / F.col("outw")).alias("p"))
        .write.mode("overwrite")
        .bucketBy(n_buckets, "src")
        .sortBy("src")
        .format("parquet")
        .saveAsTable(table)
    )
    build_s = round(time.perf_counter() - t0, 3)
    trans = spark.table(table)
    n = deg.count()
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
    return _iterate(trans, n, ranks), build_s


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("r19-bucketed-ab")
    _load_all()
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    fn = REGISTRY["graph_pagerank"].fn
    out = {"n_buckets": n_buckets, "scales": {}}
    for n in (1, reps):
        d = build_trade(spark, n)
        try:
            rec = {}
            ref = None
            for _ in range(2):
                release_all(spark)
                t0 = time.perf_counter()
                got = sorted(map(tuple, fn(spark, d).collect()))
                dt = round(time.perf_counter() - t0, 3)
                rec["persist"] = min(rec.get("persist", dt), dt)
                ref = got
                release_all(spark)
                t0 = time.perf_counter()
                bdf, build_s = pagerank_bucketed(spark, d, "r19_pr_edges", n_buckets)
                got_b = sorted(map(tuple, bdf.collect()))
                dt = round(time.perf_counter() - t0, 3)
                rec["bucketed_total"] = min(rec.get("bucketed_total", dt), dt)
                rec["bucketed_build"] = min(rec.get("bucketed_build", build_s), build_s)
                assert got_b == ref, f"bucketed result differs at {n}x"
            rec["identical"] = True
            out["scales"][f"{n}x"] = rec
            print(n, rec, flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
            spark.sql("DROP TABLE IF EXISTS r19_pr_edges")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
