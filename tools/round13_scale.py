"""sf0.1 -> sf1-equivalent (10x) scaling rows for the round-13 debuts and
the two redesigned flag queries (BASELINE.md replica method —
tools/round6..12_scale.py lineage): the streaming doc-gate readout, CDC
chunk dedup, the robots gate, budget selection, line dedup, the rotated
PDF/MSG fixture paths, and the banded-median / persisted-skeleton
rewrites of stat_theilsen_line and pack_bfd_assignments.

sim_ivf_autotune is deliberately absent: replicate_ids would clone every
vector 10x, making each query's true top-k its own clones — a degenerate
recall surface that measures nothing (its cost decomposes as one index
build + a 32-query exact ground truth, both already characterized).

Run: PYTHONPATH=/root/repo python tools/round13_scale.py
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

DOC_QUERIES = [
    "streaming_docgate_readout",
    "dedup_cdc_chunks",
    "curate_robots_gate",
    "curate_budget_select",
    "text_dedup_lines",
    "doc_pdf_extract",
    "doc_msg_extract",
    "pack_bfd_assignments",
]
ORDER_QUERIES = ["stat_theilsen_line"]


def build_replica(spark) -> str:
    base = tempfile.mkdtemp(prefix="r13_scale_sf1_")
    replicate_documents(
        load(spark, SF_DIR, "documents"), N_REPLICAS, carry=["lang", "source"]
    ).select(
        "doc_id", "text", "lang", "source",
        F.length("text").alias("n_chars"),
    ).write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "orders"), ["o_orderkey", "o_custkey"], N_REPLICAS
    ).write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))
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
    SPARK = get_spark("round13-scale")
    qs = all_queries()
    load(SPARK, SF_DIR, "documents").count()
    load(SPARK, SF_DIR, "orders").count()
    sf1 = build_replica(SPARK)
    print(f"replica at {sf1}", file=sys.stderr)
    rows = []
    for name in DOC_QUERIES + ORDER_QUERIES:
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
