"""sf0.1 -> sf1-equivalent (10x) scaling row for Mondrian k-anonymization
(operators/mondrian.py) — the round's iterative debut.

Replica design: 10x the customer rows with acctbal jittered per replica
(k * 1e-5, far below the data's cent spacing — the QI value DOMAIN grows
with the rows, as a real microdata table's would) and custkey offset for
uniqueness. Mondrian's cost model is rounds x (two shuffles over N): at
10x rows and fixed k the leaf count grows ~10x, the tree one level
deeper (~log2 10 ≈ 3 extra rounds), so the honest expectation is mildly
superlinear in round count but sublinear in wall on 32 idle cores.

Run (idle host): PYTHONPATH=/root/repo python tools/round17b_scale.py
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
from pasardassist_spark.operators.mondrian import mondrian_anonymize
from pasardassist_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 50


def build(spark, n: int) -> str:
    base = tempfile.mkdtemp(prefix=f"r17b_mondrian{n}_")
    c = load(spark, SF_DIR, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    rep = c.crossJoin(
        F.broadcast(spark.range(n).select(F.col("id").alias("_rep")))
    )
    rep = (
        rep.withColumn(
            "c_custkey", F.col("c_custkey") + F.col("_rep") * F.lit(100_000_000)
        )
        .withColumn(
            "c_acctbal", F.col("c_acctbal") + F.col("_rep") * F.lit(1e-5)
        )
        .drop("_rep")
    )
    rep.write.mode("overwrite").parquet(os.path.join(base, "customer.parquet"))
    return base


def run(spark, sf_dir: str) -> tuple[float, int, int]:
    src = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    best = None
    out_stats = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = mondrian_anonymize(
            src, ["c_acctbal", "c_nationkey"], K
        )
        stats = out.agg(
            F.count_distinct("class_id"), F.min("class_size")
        ).first()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        out_stats = (int(stats[0]), int(stats[1]))
    return round(best, 3), *out_stats


if __name__ == "__main__":
    spark = get_spark("round17b-scale")
    one, ten = build(spark, 1), build(spark, 10)
    try:
        t1, c1, m1 = run(spark, one)
        t10, c10, m10 = run(spark, ten)
        print(json.dumps({
            "mondrian_k50": {
                "sf0.1_s": t1, "sf1eq_s": t10,
                "ratio": round(t10 / t1, 2),
                "classes_1x": c1, "classes_10x": c10,
                "min_class_1x": m1, "min_class_10x": m10,
            }
        }, indent=1))
    finally:
        shutil.rmtree(one, ignore_errors=True)
        shutil.rmtree(ten, ignore_errors=True)
