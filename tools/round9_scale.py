"""sf0.1 → sf1-equivalent scaling rows for the round-9 operators
(BASELINE.md replica method: 10x documents with disjoint doc_ids and
replica-prefixed tokens so shingle/passage structure replicates WITHOUT
cross-replica collisions; events with disjoint event ids, same time span
and type dimension — the rate feed a nearest-asof join probes stays
dim-sized while the fact side grows 10x, which is the operator's actual
100 TB shape).

Measures warm (min-of-2) wall time through a noop sink per (query, scale)
and prints one JSON line per row plus a markdown table for BASELINE.md.

Run: PYTHONPATH=/root/repo python tools/round9_scale.py
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
    "text_boilerplate_strip",
    "dedup_containment",
    "mm_gif_decode",
    "curate_gopher_rules",
    "aj_nearest_rate",
    "stat_mannwhitney_u",
    "u5_unpivot_metrics",
]


def build_replica(spark) -> str:
    base = tempfile.mkdtemp(prefix="r9_scale_sf1_")
    replicate_documents(
        load(spark, SF_DIR, "documents"), N_REPLICAS, carry=["lang", "source"]
    ).select(
        "doc_id", "text", "lang", "source",
        F.length("text").alias("n_chars"),
    ).write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "events"), ["event_id", "user_id"], N_REPLICAS
    ).write.mode("overwrite").parquet(os.path.join(base, "events.parquet"))
    # dims the relational queries touch, unchanged (dim tables don't grow)
    for t in ("customer", "nation"):
        shutil.copytree(
            os.path.join(SF_DIR, f"{t}.parquet"),
            os.path.join(base, f"{t}.parquet"),
        ) if os.path.isdir(os.path.join(SF_DIR, f"{t}.parquet")) else shutil.copy(
            os.path.join(SF_DIR, f"{t}.parquet"),
            os.path.join(base, f"{t}.parquet"),
        )
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
    SPARK = get_spark("round9-scale")
    qs = all_queries()
    load(SPARK, SF_DIR, "lineitem").count()  # warmup / page cache
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
        print(json.dumps(row))
    print("\n| Operator | sf0.1 (s) | sf1 (s) | wall ratio | output rows |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['sf0.1_s']} | {r['sf1_s']} |"
            f" {r['ratio']}x | {r['rows0.1']}→{r['rows1']} |"
        )
    shutil.rmtree(sf1, ignore_errors=True)
