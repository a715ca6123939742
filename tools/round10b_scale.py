"""sf0.1 → sf1-equivalent scaling rows for the round-10 third-batch
operators (the BASELINE.md replica method — tools/round10_scale.py).

Replica construction per table family:
- documents: replicate_documents (disjoint doc_ids, replica-prefixed
  tokens, lang/source carried) — split/readability/wordpiece/avro see
  10x docs AND a 10x word-type table;
- events: replicate_ids on event_id with value/event_type/ts/props
  verbatim — the moment/bootstrap queries see 10x fact rows with the
  same distributional shape;
- orders+lineitem: replicate_ids offsetting o_orderkey/l_orderkey AND
  o_custkey/l_suppkey by the same replica stride, so the trade graph
  becomes 10 DISJOINT copies — k-core and Theil-Sen measure honest 10x
  structure, not an artificially densified merge of replicas.

Run: PYTHONPATH=/root/repo python tools/round10b_scale.py
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
    "stat_welch_ttest",
    "stat_anova_oneway",
    "stat_bootstrap_ci",
    "split_stratified_exact",
    "text_readability",
    "wordpiece_train_vocab",
    "wordpiece_encode_corpus",
    "src_avro_roundtrip",
    "stat_theilsen_line",
    "graph_kcore",
]


def build_replica(spark) -> str:
    base = tempfile.mkdtemp(prefix="r10b_scale_sf1_")
    replicate_documents(
        load(spark, SF_DIR, "documents"), N_REPLICAS, carry=["lang", "source"]
    ).select(
        "doc_id", "text", "lang", "source",
        F.length("text").alias("n_chars"),
    ).write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "events"), ["event_id"], N_REPLICAS
    ).write.mode("overwrite").parquet(os.path.join(base, "events.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "orders"), ["o_orderkey", "o_custkey"], N_REPLICAS
    ).write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "lineitem"), ["l_orderkey", "l_suppkey"], N_REPLICAS
    ).write.mode("overwrite").parquet(os.path.join(base, "lineitem.parquet"))
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
    SPARK = get_spark("round10b-scale")
    qs = all_queries()
    load(SPARK, SF_DIR, "documents").count()  # warmup / page cache
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
