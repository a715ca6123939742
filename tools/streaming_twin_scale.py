"""sf0.1 → sf1-equivalent scaling measurement for the streaming twins
(VERDICT r6 #8 / r7 #6): dedup ingest gate, ANN index maintenance, HLL
distinct-count monitor. Their 100 TB claim is about STATE growth vs corpus
growth and per-batch cost stability, so this harness measures exactly
that, per scale:

- corpus rows in, final state rows, final state bytes on disk (latest
  committed generation only — retained history is a knob, not state);
- wall time of the first and the last batch (a standing index must not
  slow down as it accumulates corpus: per-batch cost is O(batch +
  touched-buckets), never O(state)).

Replica method = BASELINE.md's: the sf0.1 tables replicated 10x with
disjoint key spaces (documents get replica-prefixed TOKENS so near-dup
structure replicates without crossing replicas; embeddings/events get
disjoint ids). The replica is built in /tmp and this script is the
committed, re-runnable harness (round 6 left only session-log numbers).

Run: PYTHONPATH=/root/repo python tools/streaming_twin_scale.py
Prints one JSON line per (twin, scale) plus a summary table.
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

from pyspark.sql import DataFrame, functions as F

from pasardassist_spark import get_spark
from pasardassist_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BATCHES = 8
N_REPLICAS = 10


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _latest_generation_bytes(state_dir: str) -> int:
    """Bytes of the newest committed generation only (hard-linked files
    shared with older generations count once — os.walk visits each name,
    so measure just the latest version dir)."""
    from pasardassist_spark.streaming.ingest import _state_versions

    versions = _state_versions(state_dir)
    if not versions:
        return 0
    return _dir_bytes(os.path.join(state_dir, versions[-1]))


def replicate_documents(
    docs: DataFrame, n: int, carry: list[str] | None = None
) -> DataFrame:
    """10x documents with disjoint doc_ids AND replica-prefixed tokens:
    shingle/minhash structure replicates inside each replica without
    cross-replica collisions (the BASELINE.md documents method).

    ``carry`` names extra columns (e.g. lang/source) copied through from
    the original row so queries that group or filter on them see the
    real sf-scale dimension mix, not a collapsed literal."""
    r = docs.crossJoin(F.broadcast(
        docs.sparkSession.range(n).select(F.col("id").alias("_rep"))
    ))
    tagged = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(F.lit("r"), F.col("_rep").cast("string"), t),
        ),
        " ",
    )
    return r.select(
        (F.col("doc_id") + F.col("_rep") * F.lit(10_000_000)).alias("doc_id"),
        tagged.alias("text"),
        *[F.col(c) for c in (carry or [])],
    )


def replicate_ids(df: DataFrame, id_cols: list[str], n: int) -> DataFrame:
    r = df.crossJoin(F.broadcast(
        df.sparkSession.range(n).select(F.col("id").alias("_rep"))
    ))
    out = r
    for c in id_cols:
        out = out.withColumn(c, F.col(c) + F.col("_rep") * F.lit(10_000_000))
    return out.drop("_rep")


def run_dedup_gate(spark, docs: DataFrame, label: str) -> dict:
    from pasardassist_spark.streaming.dedupindex import apply_dedup_batch
    from pasardassist_spark.streaming.ingest import read_state

    base = tempfile.mkdtemp(prefix=f"twin_dedup_{label}_")
    state, adm = os.path.join(base, "state"), os.path.join(base, "adm")
    docs = docs.select("doc_id", "text").persist()
    n_rows = docs.count()
    batch_walls = []
    for b in range(N_BATCHES):
        batch = docs.filter(F.pmod(F.col("doc_id"), N_BATCHES) == b)
        t0 = time.perf_counter()
        apply_dedup_batch(batch, b, state, adm, "text", "doc_id")
        batch_walls.append(round(time.perf_counter() - t0, 3))
    hashes = read_state(spark, os.path.join(state, "hashes"))
    sigs = read_state(spark, os.path.join(state, "sigs"))
    out = {
        "twin": "dedup_gate", "scale": label, "corpus_rows": n_rows,
        "state_rows": hashes.count() + sigs.count(),
        "state_bytes": _latest_generation_bytes(os.path.join(state, "hashes"))
        + _latest_generation_bytes(os.path.join(state, "sigs")),
        "first_batch_s": batch_walls[0], "last_batch_s": batch_walls[-1],
        "total_s": round(sum(batch_walls), 3),
    }
    docs.unpersist()
    shutil.rmtree(base, ignore_errors=True)
    return out


def run_ann_index(spark, emb: DataFrame, centroids: DataFrame, label: str) -> dict:
    from pasardassist_spark.operators.similarity import assign_lists
    from pasardassist_spark.streaming.annindex import _latest_epoch_wins
    from pasardassist_spark.streaming.ingest import (
        merge_into_bucketed_state,
        read_state,
    )

    base = tempfile.mkdtemp(prefix=f"twin_ann_{label}_")
    state = os.path.join(base, "state")
    emb = emb.persist()
    n_rows = emb.count()
    batch_walls = []
    for b in range(N_BATCHES):
        batch = emb.filter(F.pmod(F.col("vec_id"), N_BATCHES) == b)
        t0 = time.perf_counter()
        delta = assign_lists(batch, centroids).select(
            "vec_id", "list_id", F.lit(b).cast("long").alias("epoch")
        )
        merge_into_bucketed_state(
            delta, state, ("vec_id",), _latest_epoch_wins, epoch_id=b
        )
        batch_walls.append(round(time.perf_counter() - t0, 3))
    st = read_state(spark, state)
    out = {
        "twin": "ann_index", "scale": label, "corpus_rows": n_rows,
        "state_rows": st.count(),
        "state_bytes": _latest_generation_bytes(state),
        "first_batch_s": batch_walls[0], "last_batch_s": batch_walls[-1],
        "total_s": round(sum(batch_walls), 3),
    }
    emb.unpersist()
    shutil.rmtree(base, ignore_errors=True)
    return out


def run_hll_monitor(spark, ev: DataFrame, label: str) -> dict:
    from pasardassist_spark.streaming.hll import (
        HLL_LG_K,
        _union_sketches,
        distinct_counts_from_state,
    )
    from pasardassist_spark.streaming.ingest import merge_into_bucketed_state

    base = tempfile.mkdtemp(prefix=f"twin_hll_{label}_")
    state = os.path.join(base, "state")
    ev = ev.select("event_id", "event_type", "user_id").persist()
    n_rows = ev.count()
    batch_walls = []
    for b in range(N_BATCHES):
        batch = ev.filter(F.pmod(F.col("event_id"), N_BATCHES) == b)
        t0 = time.perf_counter()
        delta = batch.groupBy("event_type").agg(
            F.hll_sketch_agg("user_id", F.lit(HLL_LG_K)).alias("sk"),
            F.count(F.lit(1)).alias("n_events"),
        )
        merge_into_bucketed_state(
            delta, state, ("event_type",), _union_sketches(["event_type"]),
            epoch_id=b,
        )
        batch_walls.append(round(time.perf_counter() - t0, 3))
    readout = distinct_counts_from_state(spark, state)
    out = {
        "twin": "hll_monitor", "scale": label, "corpus_rows": n_rows,
        "state_rows": readout.count(),
        "state_bytes": _latest_generation_bytes(state),
        "first_batch_s": batch_walls[0], "last_batch_s": batch_walls[-1],
        "total_s": round(sum(batch_walls), 3),
    }
    ev.unpersist()
    shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    spark = get_spark("streaming-twin-scale")
    spark.sparkContext.setLogLevel("ERROR")

    docs01 = load(spark, SF_DIR, "documents").select("doc_id", "text")
    docs1 = replicate_documents(docs01, N_REPLICAS)
    emb01 = load(spark, SF_DIR, "embeddings")
    emb1 = replicate_ids(emb01, ["vec_id"], N_REPLICAS)
    ev01 = load(spark, SF_DIR, "events")
    ev1 = replicate_ids(ev01, ["event_id", "user_id"], N_REPLICAS)

    # FROZEN coarse quantizer, shared across scales (maintenance never
    # retrains — that is a rebuild by contract)
    from pasardassist_spark.operators.similarity import ivf_assignments

    _asg, centroids = ivf_assignments(emb01)
    centroids = spark.createDataFrame(
        centroids.collect(), "list_id int, center array<double>"
    )

    results = []
    for fn, a, b in [
        (run_dedup_gate, docs01, docs1),
        (lambda s, d, l: run_ann_index(s, d, centroids, l), emb01, emb1),
        (run_hll_monitor, ev01, ev1),
    ]:
        for df, label in [(a, "sf0.1"), (b, "sf1")]:
            r = fn(spark, df, label)
            results.append(r)
            print(json.dumps(r), flush=True)

    by = {(r["twin"], r["scale"]): r for r in results}
    print("\n| twin | corpus 10x | state rows x | state bytes x | last-batch x |")
    print("|---|---|---|---|---|")
    for twin in ["dedup_gate", "ann_index", "hll_monitor"]:
        s, l = by[(twin, "sf0.1")], by[(twin, "sf1")]
        print(
            f"| {twin} | {s['corpus_rows']}→{l['corpus_rows']} "
            f"| {l['state_rows'] / max(s['state_rows'], 1):.1f}x "
            f"| {l['state_bytes'] / max(s['state_bytes'], 1):.1f}x "
            f"| {l['last_batch_s'] / max(s['last_batch_s'], 1e-9):.1f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
