"""sf0.1 -> sf1-equivalent (10x) scaling rows for the two engines whose
oracles were rewritten for two-SF certification this round:

- dedup_setjoin_prefix (operators/dedup.prefix_filtered_jaccard_pairs):
  scale axis = documents. A naive 10x replica (copy with new doc_ids)
  would make every document 9 perfect twins — the OUTPUT pair count
  would grow quadratically and the run would measure result-size blowup,
  not engine scaling. Each replica k therefore inserts a replica tag
  token between every pair of words (regexp on whitespace), which makes
  shingle sets DISJOINT across replicas (cross-replica Jaccard = 0)
  while preserving intra-replica near-dup structure — output pairs and
  candidate-block shapes grow ~linearly, the honest scaling shape. The
  1x baseline applies the SAME transform (replica 0 only), so the two
  measurements are apples to apples.

- link_records_clusters (operators/linkage.link_records): scale axis =
  entities. Replica k offsets p_partkey and suffixes p_brand with the
  replica id, so the blocking key space grows 10x while each block keeps
  its original size — more blocks in flight, never bigger ones (the way
  a real entity corpus grows).

Target: wall ratio <= ~10x (linear in input) for both. Run on an idle
host: PYTHONPATH=/root/repo python tools/round17_scale.py
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
from pasardassist_spark.queries import all_queries
from pasardassist_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_docs_replica(spark, n: int) -> str:
    base = tempfile.mkdtemp(prefix=f"r17_scale_docs{n}_")
    d = load(spark, SF_DIR, "documents")
    rep = d.crossJoin(
        F.broadcast(spark.range(n).select(F.col("id").alias("_rep")))
    )
    rep = (
        rep.withColumn(
            "doc_id", F.col("doc_id") + F.col("_rep") * F.lit(100_000_000)
        )
        .withColumn(
            "text",
            F.regexp_replace(
                F.col("text"), "\\s+",
                F.concat(F.lit(" zq"), F.col("_rep").cast("string"), F.lit(" ")),
            ),
        )
        .drop("_rep")
    )
    rep.write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
    return base


def build_part_replica(spark, n: int) -> str:
    base = tempfile.mkdtemp(prefix=f"r17_scale_part{n}_")
    p = load(spark, SF_DIR, "part")
    rep = p.crossJoin(
        F.broadcast(spark.range(n).select(F.col("id").alias("_rep")))
    )
    rep = (
        rep.withColumn(
            "p_partkey", F.col("p_partkey") + F.col("_rep") * F.lit(100_000_000)
        )
        .withColumn(
            "p_brand",
            F.concat(F.col("p_brand"), F.lit("#"), F.col("_rep").cast("string")),
        )
        .drop("_rep")
    )
    rep.write.mode("overwrite").parquet(os.path.join(base, "part.parquet"))
    return base


def time_query(spark, qs, name, sf_dir) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None else min(best, dt)
    return best


if __name__ == "__main__":
    spark = get_spark("round17-scale")
    qs = all_queries()
    # warm codegen/session paths off the record
    qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    rows = {}
    for name, builder in (
        ("dedup_setjoin_prefix", build_docs_replica),
        ("link_records_clusters", build_part_replica),
    ):
        one = builder(spark, 1)
        ten = builder(spark, 10)
        try:
            t1 = time_query(spark, qs, name, one)
            t10 = time_query(spark, qs, name, ten)
            n1 = qs[name](spark, one).count()
            n10 = qs[name](spark, ten).count()
            rows[name] = {
                "sf0.1_s": t1,
                "sf1eq_s": t10,
                "ratio": round(t10 / t1, 2),
                "out_rows_1x": n1,
                "out_rows_10x": n10,
            }
            print(json.dumps({name: rows[name]}), flush=True)
        finally:
            shutil.rmtree(one, ignore_errors=True)
            shutil.rmtree(ten, ignore_errors=True)
    print(json.dumps({"rows": rows}, indent=1))
