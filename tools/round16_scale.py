"""sf0.1 -> sf1-equivalent (10x) scaling rows for the round-16 rank-
statistic migration (VERDICT r15 task 1 "done" criterion): ml_auc_roc,
stat_kruskal_wallis, stat_cvm_2samp, newly rewired onto the two-phase
distributed inclusive prefix sum.

These queries' scale axis is the DISTINCT-VALUE domain (the prefix sum
runs at value grain), so the 10x replica must grow distinct values, not
just row count: each replica k jitters ``value`` by k * 1e-7 (far below
the data's value spacing, so tie structure within a replica is preserved
while the distinct domain grows ~10x) and offsets event_id to keep rows
unique. The single-partition window these queries used before r16 would
funnel this whole domain through one task; the bucketed cumsum spreads it
across 256 range buckets.

Run (idle host): PYTHONPATH=/root/repo python tools/round16_scale.py
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
N_REPLICAS = 10
QUERIES = ["ml_auc_roc", "stat_kruskal_wallis", "stat_cvm_2samp", "stat_ks_test"]


def build_replica(spark) -> str:
    base = tempfile.mkdtemp(prefix="r16_scale_sf1_")
    ev = load(spark, SF_DIR, "events")
    rep = ev.crossJoin(
        F.broadcast(spark.range(N_REPLICAS).select(F.col("id").alias("_rep")))
    )
    rep = (
        rep.withColumn(
            "event_id", F.col("event_id") + F.col("_rep") * F.lit(100_000_000)
        )
        .withColumn("value", F.col("value") + F.col("_rep") * F.lit(1e-7))
        .drop("_rep")
    )
    rep.write.mode("overwrite").parquet(os.path.join(base, "events.parquet"))
    return base


def time_query(spark, qs, name, sf_dir) -> tuple[float, int]:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None else min(best, dt)
    # distinct-value domain is the scale axis — record it alongside
    return best, None


if __name__ == "__main__":
    spark = get_spark("round16-scale")
    qs = all_queries()
    load(spark, SF_DIR, "lineitem").count()
    qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    big = build_replica(spark)
    try:
        n1 = load(spark, SF_DIR, "events").select("value").distinct().count()
        n10 = spark.read.parquet(os.path.join(big, "events.parquet")).select(
            "value"
        ).distinct().count()
        rows = {}
        for name in QUERIES:
            t1, _ = time_query(spark, qs, name, SF_DIR)
            t10, _ = time_query(spark, qs, name, big)
            rows[name] = {
                "sf0.1_s": t1,
                "sf1eq_s": t10,
                "ratio": round(t10 / t1, 2),
            }
            print(json.dumps({name: rows[name]}), flush=True)
        print(json.dumps({
            "distinct_values_sf0.1": n1,
            "distinct_values_sf1eq": n10,
            "rows": rows,
        }, indent=1))
    finally:
        shutil.rmtree(big, ignore_errors=True)
