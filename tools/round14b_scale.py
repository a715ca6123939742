"""sf0.1 -> sf1-equivalent (10x) scaling rows for the round-14
second-session debuts (BASELINE.md replica method —
tools/round6..14_scale.py lineage): the new stats shelf (Friedman,
Brown-Forsythe, Jarque-Bera, Cramér's V, two-sample CvM), change-point
localization, PACF, distributed k-means, the three container-metadata
walks (MP4, FLAC/Ogg, Matroska), and the two extract families whose
fixture rotations gained encrypted variants (AES-256 PDFs, FILEPASS
xls, AES-256 ODT).

Run: PYTHONPATH=/root/repo python tools/round14b_scale.py
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
    # stats/timeseries/ML debuts (events/embeddings tables)
    "stat_friedman",
    "stat_brown_forsythe",
    "stat_jarque_bera",
    "stat_cramers_v",
    "stat_cvm_2samp",
    "ts_changepoint",
    "ts_pacf",
    "ml_kmeans",
    # container-metadata walks (documents ids)
    "mm_mp4_meta",
    "mm_flac_ogg_meta",
    "mm_mkv_meta",
    # extract families with new encrypted rotations
    "doc_pdf_extract",
    "doc_xls_extract",
    "doc_odt_extract",
    "doc_legacy_extract",
    # late second-session debuts
    "stat_runs_test",
    "samp_neyman_allocation",
    "stat_permutation_paired",
    "ml_isotonic_calibration",
    "graph_assortativity",
]

# queries reading orders/customer (stat_cramers_v) scale by replicating
# the two relational tables on their keys
_RELATIONAL = {"stat_cramers_v"}
# embeddings-table queries
_EMBEDDINGS = {"ml_kmeans"}


def build_replica(spark) -> str:
    base = tempfile.mkdtemp(prefix="r14b_scale_sf1_")
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
        load(spark, SF_DIR, "embeddings"), ["vec_id"], N_REPLICAS
    ).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    replicate_ids(
        load(spark, SF_DIR, "orders"), ["o_orderkey", "o_custkey"],
        N_REPLICAS,
    ).write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "lineitem"), ["l_orderkey", "l_partkey"],
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
    SPARK = get_spark("round14b-scale")
    qs = all_queries()
    for t in ("documents", "events", "embeddings", "orders", "customer", "lineitem"):
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
