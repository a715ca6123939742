"""sf0.1 -> sf1-equivalent (10x) scaling rows for round 15
(BASELINE.md replica method — tools/round6..14_scale.py lineage):
the un-tabled late r14 debuts (Hodges-Lehmann, naive Bayes, link
prediction), the two de-hinted degree-join graph queries post-fix,
the three de-hinted anchors that re-anchored (+9-11%), and the
families whose fixture rotations gained new variants this round
(fragmented MP4, unsync ID3, Blowfish ODT, encrypted ppt via the
any-doc pipeline).

Run: PYTHONPATH=/root/repo python tools/round15_scale.py
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
from tools.streaming_twin_scale import replicate_documents, replicate_ids

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_REPLICAS = 10

QUERIES = [
    # un-tabled late r14 debuts
    "stat_hodges_lehmann",
    "ml_naive_bayes",
    "graph_link_prediction",
    "ml_isotonic_calibration",
    # de-hinted degree joins, re-measured post-fix
    "graph_assortativity",
    "mb_pair_lift",
    # fixture rotations gaining new variants this round
    "mm_mp4_meta",
    "mm_id3_tags",
    "doc_odt_extract",
    "pipeline_any_doc_extract",
]


def build_replica(spark) -> str:
    base = tempfile.mkdtemp(prefix="r15_scale_sf1_")
    replicate_documents(
        load(spark, SF_DIR, "documents"), N_REPLICAS, carry=["lang", "source"]
    ).select(
        "doc_id", "text", "lang", "source",
        F.length("text").alias("n_chars"),
    ).write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "events"), ["event_id", "user_id"], N_REPLICAS
    ).write.mode("overwrite").parquet(os.path.join(base, "events.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "orders"), ["o_orderkey", "o_custkey"],
        N_REPLICAS,
    ).write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "lineitem"),
        ["l_orderkey", "l_partkey", "l_suppkey"],
        N_REPLICAS,
    ).write.mode("overwrite").parquet(
        os.path.join(base, "lineitem.parquet")
    )
    replicate_ids(
        load(spark, SF_DIR, "customer"), ["c_custkey"], N_REPLICAS
    ).write.mode("overwrite").parquet(os.path.join(base, "customer.parquet"))
    return base


def time_query(qs, name, sf_dir) -> tuple[float, int]:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](SPARK, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None else min(best, dt)
    rows = qs[name](SPARK, sf_dir).count()
    return best, rows


if __name__ == "__main__":
    SPARK = get_spark("round15-scale")
    qs = all_queries()
    for t in ("documents", "events", "orders", "customer", "lineitem"):
        load(SPARK, SF_DIR, t).count()
    sf1 = build_replica(SPARK)
    print(f"replica at {sf1}", file=sys.stderr)
    rows = []
    for name in QUERIES:
        t01, n01 = time_query(qs, name, SF_DIR)
        t1, n1 = time_query(qs, name, sf1)
        row = {
            "query": name, "sf0.1_s": t01, "sf1_s": t1,
            "ratio": round(t1 / t01, 1), "rows0.1": n01, "rows1": n1,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print("\n| Operator | sf0.1 (s) | sf1 (s) | wall ratio | output rows |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['sf0.1_s']} | {r['sf1_s']} |"
            f" {r['ratio']}x | {r['rows0.1']}→{r['rows1']} |"
        )
    shutil.rmtree(sf1, ignore_errors=True)
