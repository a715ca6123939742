"""Round-16 stretch (VERDICT r15 task 8): the docgate O(batch + touched
buckets) claim's next decade — per-batch cost against 1x / 10x / 100x
STANDING STATE on the disk-backed generational store.

Design differs from the 10x twin (tools/round15b_twinscale.py) in one
deliberate way: the measured quantity is a PROBE batch of FIXED sf0.1
size applied after the state has been seeded to each scale. The 10x twin
scaled batch and state together (so "last batch ~flat" mixed two
effects); here the probe isolates exactly the claim — a batch of
constant size must cost ~the same whether the standing dedup state holds
1x, 10x, or 100x of the corpus, because the merge only rewrites the
buckets the batch touches and hard-links the rest.

Corpus construction is the gate-aware marker interspersal from the 10x
twin (stopwords survive the Gopher gate; every 5-shingle carries a
replica-and-doc-unique token so near-dup bands cannot fire across
replicas). Seeding runs in 4 epochs regardless of scale (bigger seed
batches — seeding cost is not the measured quantity); the probe is
epoch 5 with a replica index above the seeded range.

Run (idle host): PYTHONPATH=/root/repo python tools/round16_twinscale100.py
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
from pasardassist_spark.tables import load
from tools.streaming_twin_scale import _latest_generation_bytes

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_SEED_BATCHES = 4
SCALES = (1, 10, 100)


def replicate_for_gate(spark, docs, reps):
    """Replicas ``reps`` (an iterable of replica indices) of the corpus
    with the r15b gate-aware marker construction."""
    r = docs.crossJoin(F.broadcast(
        spark.createDataFrame([(i,) for i in reps], "_rep long")
    ))
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    marker = F.concat(
        F.lit("qzr"), F.col("_rep").cast("string"),
        F.lit("d"), F.col("doc_id").cast("string"), F.lit("x"),
    )
    tagged = F.array_join(
        F.flatten(
            F.transform(
                words,
                lambda w, i: F.when(
                    i % 3 == 2, F.array(w, marker)
                ).otherwise(F.array(w)),
            )
        ),
        " ",
    )
    return r.select(
        (F.col("doc_id") + F.col("_rep") * F.lit(10_000_000)).alias("doc_id"),
        F.encode(tagged, "utf-8").alias("payload"),
    )


def run_scale(spark, docs, scale: int) -> dict:
    from pasardassist_spark.streaming.docgate import apply_doc_batch
    from pasardassist_spark.streaming.ingest import read_state

    base = tempfile.mkdtemp(prefix=f"twin100_docgate_{scale}x_")
    state, adm = os.path.join(base, "state"), os.path.join(base, "adm")
    seed = replicate_for_gate(spark, docs, range(scale)).persist()
    n_seed = seed.count()
    seed_walls = []
    for b in range(N_SEED_BATCHES):
        batch = seed.filter(F.pmod(F.col("doc_id"), N_SEED_BATCHES) == b)
        t0 = time.perf_counter()
        apply_doc_batch(batch, b, state, adm)
        seed_walls.append(round(time.perf_counter() - t0, 3))
    seed.unpersist()
    # fixed-size probe: ONE fresh sf0.1-sized replica, epoch N_SEED_BATCHES
    probe = replicate_for_gate(spark, docs, [scale]).persist()
    n_probe = probe.count()
    t0 = time.perf_counter()
    apply_doc_batch(probe, N_SEED_BATCHES, state, adm)
    probe_wall = round(time.perf_counter() - t0, 3)
    probe.unpersist()
    hashes = read_state(spark, os.path.join(state, "hashes"))
    sigs = read_state(spark, os.path.join(state, "sigs"))
    out = {
        "twin": "doc_gate_probe", "scale": f"{scale}x",
        "seed_rows": n_seed, "probe_rows": n_probe,
        "state_rows": (hashes.count() if hashes is not None else 0)
        + (sigs.count() if sigs is not None else 0),
        "state_bytes": _latest_generation_bytes(os.path.join(state, "hashes"))
        + _latest_generation_bytes(os.path.join(state, "sigs")),
        "seed_first_s": seed_walls[0], "seed_last_s": seed_walls[-1],
        "probe_batch_s": probe_wall,
    }
    shutil.rmtree(base, ignore_errors=True)
    return out


if __name__ == "__main__":
    spark = get_spark("round16-twinscale100")
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.count()
    rows = []
    for scale in SCALES:
        rows.append(run_scale(spark, docs, scale))
        print(json.dumps(rows[-1]), flush=True)
    base = rows[0]
    print("\n| standing state | state rows | state bytes | probe batch (fixed size) |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['scale']} | {r['state_rows']} "
            f"({round(r['state_rows'] / max(1, base['state_rows']), 1)}x) "
            f"| {round(r['state_bytes'] / 1e6, 1)} MB "
            f"({round(r['state_bytes'] / max(1, base['state_bytes']), 1)}x) "
            f"| {r['probe_batch_s']} s "
            f"({round(r['probe_batch_s'] / max(0.001, base['probe_batch_s']), 2)}x) |"
        )
