"""Two-decade scale validation (VERDICT r11 #5): sf0.1 -> 10x -> 100x
(sf10-equivalent, ~60 M lineitem) for the top-5 headline queries plus
the two linear-in-pairs dedup joins, certifying that no plan breaks
super-linear in the SECOND decade (BASELINE.md replica method —
tools/round6..11_scale.py lineage).

Replica construction (tools/streaming_twin_scale.py helpers):
- documents: replica-prefixed tokens under disjoint doc_ids, so dedup
  pair structure replicates inside each replica without cross-replica
  collisions — output pair counts grow exactly with the replica factor;
- lineitem/orders/customer/supplier: disjoint key spaces with the SAME
  per-replica offset on both sides of every join key, so fact-fact and
  fact-dim joins stay internally consistent.

Measurement: min-of-2 noop writes at sf0.1 and 10x (the bench
methodology); ONE pass at 100x — the dedup joins are pair-linear, so a
second 10-minute pass buys no information (documented in BASELINE.md).

Run: PYTHONPATH=/root/repo python tools/round12_scale.py
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

# top-5 headline by r11 cost: wide agg, fact-fact-dim join, composite-key
# fact join, latest-per-key, multi-count dashboard
TPCH_QUERIES = [
    "q1_pricing_summary",
    "a11_collection_stats",
    "j2_composite_key",
    "j3_latest_order_per_customer",
    "a12_wallet_dashboard",
]
# the two linear-in-pairs dedup joins (r11 plan audit)
DEDUP_QUERIES = ["dedup_setjoin_prefix", "dedup_fuzzy_levenshtein"]

# re-runs can skip the already-recorded prefix (BASELINE.md table rows)
SKIP = int(os.environ.get("SPARK_GRAFT_SCALE_SKIP", "0"))


def build_replica(spark, n: int) -> str:
    base = tempfile.mkdtemp(prefix=f"r12_scale_{n}x_")
    replicate_documents(
        load(spark, SF_DIR, "documents"), n, carry=["lang", "source"]
    ).select(
        "doc_id", "text", "lang", "source",
        F.length("text").alias("n_chars"),
    ).write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "lineitem"), ["l_orderkey", "l_suppkey"], n
    ).write.mode("overwrite").parquet(os.path.join(base, "lineitem.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "orders"), ["o_orderkey", "o_custkey"], n
    ).write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "customer"), ["c_custkey"], n
    ).write.mode("overwrite").parquet(os.path.join(base, "customer.parquet"))
    replicate_ids(
        load(spark, SF_DIR, "supplier"), ["s_suppkey"], n
    ).write.mode("overwrite").parquet(os.path.join(base, "supplier.parquet"))
    # part: disjoint keys AND replica-prefixed brands — the fuzzy dedup
    # blocks on brand, so prefixing keeps every comparison within a
    # replica and the pair count grows exactly n-fold (verbatim names
    # would form n^2 cross-replica zero-distance pairs)
    p = load(spark, SF_DIR, "part")
    rp = p.crossJoin(
        F.broadcast(spark.range(n).select(F.col("id").alias("_rep")))
    )
    rp.select(
        (F.col("p_partkey") + F.col("_rep") * F.lit(10_000_000)).alias(
            "p_partkey"
        ),
        F.concat(
            F.lit("r"), F.col("_rep").cast("string"), F.col("p_brand")
        ).alias("p_brand"),
        *[c for c in p.columns if c not in ("p_partkey", "p_brand")],
    ).write.mode("overwrite").parquet(os.path.join(base, "part.parquet"))
    return base


def time_min2(qs, name, sf_dir) -> tuple[float, int]:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](SPARK, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None else min(best, dt)
    rows = qs[name](SPARK, sf_dir).count()
    return best, rows


def time_once(qs, name, sf_dir) -> tuple[float, int]:
    """One timed count() pass — full compute + the row count the
    linearity certification actually needs."""
    t0 = time.perf_counter()
    rows = qs[name](SPARK, sf_dir).count()
    return round(time.perf_counter() - t0, 3), rows


if __name__ == "__main__":
    SPARK = get_spark("round12-scale")
    qs = all_queries()
    load(SPARK, SF_DIR, "lineitem").count()  # warmup / page cache
    rep10 = build_replica(SPARK, 10)
    rep100 = build_replica(SPARK, 100)
    print(f"replicas at {rep10} (10x), {rep100} (100x)", file=sys.stderr)

    rows = []
    for name in (TPCH_QUERIES + DEDUP_QUERIES)[SKIP:]:
        t01, n01 = time_min2(qs, name, SF_DIR)
        t10, n10 = time_min2(qs, name, rep10)
        if name in DEDUP_QUERIES:
            t100, n100 = time_once(qs, name, rep100)
        else:
            t100, n100 = time_min2(qs, name, rep100)
        row = {
            "query": name,
            "sf0.1_s": t01, "x10_s": t10, "x100_s": t100,
            "decade1": round(t10 / t01, 1),
            "decade2": round(t100 / t10, 1),
            "rows": f"{n01}/{n10}/{n100}",
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| Operator | sf0.1 (s) | 10x (s) | 100x (s) | decade1 | decade2 | rows 0.1/10x/100x |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['sf0.1_s']} | {r['x10_s']} | {r['x100_s']} |"
            f" {r['decade1']}x | {r['decade2']}x | {r['rows']} |"
        )
    shutil.rmtree(rep10, ignore_errors=True)
    shutil.rmtree(rep100, ignore_errors=True)
