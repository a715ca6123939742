"""sf0.1 -> sf1-equivalent (10x) scaling rows for the round-15 late
debuts (replica method, tools/round15_scale.py lineage): the four new
no-decode metadata walks (HEIF/AVIF, AIFF, ICO, SVG) and the
mm_mp3_frames layer/free-format rotation.

Run: PYTHONPATH=/root/repo python tools/round15c_scale.py
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

from pasardassist_spark import get_spark
from pasardassist_spark.queries import all_queries
from pasardassist_spark.tables import load
from tools.streaming_twin_scale import replicate_ids

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_REPLICAS = 10

QUERIES = [
    "mm_heif_meta",
    "mm_aiff_meta",
    "mm_ico_meta",
    "mm_svg_meta",
    "mm_mp3_frames",
]


def build_replica(spark) -> str:
    base = tempfile.mkdtemp(prefix="r15c_scale_sf1_")
    replicate_ids(
        load(spark, SF_DIR, "documents").select("doc_id"), ["doc_id"],
        N_REPLICAS,
    ).write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
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
    SPARK = get_spark("round15c-scale")
    qs = all_queries()
    load(SPARK, SF_DIR, "documents").count()
    sf1 = build_replica(SPARK)
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
