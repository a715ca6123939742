"""Streaming state-scaling rows for the r13/r14 composite gates
(docgate, imagegate) in the round-8 twin table format
(tools/streaming_twin_scale.py lineage): drive apply_doc_batch /
apply_image_batch for 4 epochs at sf0.1 and at the 10x replica, and
report corpus rows, standing-state rows/bytes (latest generation), and
first/last batch wall — the numbers that certify per-batch cost stays
O(batch + touched buckets) as standing state grows.

Replica caveats (BASELINE.md r14 precedent): document tokens are
replica-prefixed so text-dedup structure replicates WITHOUT
cross-replica collisions; image dHash keys are doc_id%65536, so the
10x replica collides MORE and admits <10x — expected, documented.

Run: PYTHONPATH=/root/repo python tools/round15b_twinscale.py
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
from tools.streaming_twin_scale import (
    _latest_generation_bytes,
    replicate_documents,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BATCHES = 4
N_REPLICAS = 10


def _doc_payloads(docs):
    """(doc_id, payload): markdown-bytes of the token-tagged text —
    the cheapest real container the dispatcher admits, so the twin
    measures the GATE + state machinery, not pdf encode cost."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def run_doc_gate(spark, docs, label: str) -> dict:
    from pasardassist_spark.streaming.docgate import apply_doc_batch
    from pasardassist_spark.streaming.ingest import read_state

    base = tempfile.mkdtemp(prefix=f"twin_docgate_{label}_")
    state, adm = os.path.join(base, "state"), os.path.join(base, "adm")
    payloads = _doc_payloads(docs).persist()
    n_rows = payloads.count()
    walls = []
    for b in range(N_BATCHES):
        batch = payloads.filter(F.pmod(F.col("doc_id"), N_BATCHES) == b)
        t0 = time.perf_counter()
        apply_doc_batch(batch, b, state, adm)
        walls.append(round(time.perf_counter() - t0, 3))
    hashes = read_state(spark, os.path.join(state, "hashes"))
    sigs = read_state(spark, os.path.join(state, "sigs"))
    out = {
        "twin": "doc_gate", "scale": label, "corpus_rows": n_rows,
        "state_rows": (hashes.count() if hashes is not None else 0)
        + (sigs.count() if sigs is not None else 0),
        "state_bytes": _latest_generation_bytes(os.path.join(state, "hashes"))
        + _latest_generation_bytes(os.path.join(state, "sigs")),
        "first_batch_s": walls[0], "last_batch_s": walls[-1],
        "total_s": round(sum(walls), 3),
    }
    payloads.unpersist()
    shutil.rmtree(base, ignore_errors=True)
    return out


def _image_payloads(spark, ids):
    def _synth(it):
        import pandas as pd

        from pasardassist_spark.operators import imagecodec
        from pasardassist_spark.operators.imagecodec import Raster

        def raster_for_key(key16: int) -> Raster:
            # the imagegate readout's dhash-exact construction
            bits = key16 * 0x0001_0001_0001_0001
            px = bytearray()
            for y in range(8):
                g = 128
                row = [g]
                for x in range(8):
                    g += 1 if (bits >> (y * 8 + x)) & 1 else -1
                    row.append(g)
                for v in row:
                    px += bytes((v, v, v))
            return Raster(9, 8, 3, bytes(px))

        for pdf in it:
            out_ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                r = raster_for_key(i % 65536)
                payloads.append(imagecodec.encode_ppm(r))
                out_ids.append(i)
            yield pd.DataFrame({"doc_id": out_ids, "payload": payloads})

    return ids.mapInPandas(_synth, "doc_id long, payload binary")


def run_image_gate(spark, ids, label: str) -> dict:
    from pasardassist_spark.streaming.imagegate import apply_image_batch
    from pasardassist_spark.streaming.ingest import read_state

    base = tempfile.mkdtemp(prefix=f"twin_imggate_{label}_")
    state, adm = os.path.join(base, "state"), os.path.join(base, "adm")
    payloads = _image_payloads(spark, ids).persist()
    n_rows = payloads.count()
    walls = []
    for b in range(N_BATCHES):
        batch = payloads.filter(F.pmod(F.col("doc_id"), N_BATCHES) == b)
        t0 = time.perf_counter()
        apply_image_batch(batch, b, state, adm)
        walls.append(round(time.perf_counter() - t0, 3))
    bands = read_state(spark, os.path.join(state, "bands"))
    out = {
        "twin": "image_gate", "scale": label, "corpus_rows": n_rows,
        "state_rows": bands.count() if bands is not None else 0,
        "state_bytes": _latest_generation_bytes(os.path.join(state, "bands")),
        "first_batch_s": walls[0], "last_batch_s": walls[-1],
        "total_s": round(sum(walls), 3),
    }
    payloads.unpersist()
    shutil.rmtree(base, ignore_errors=True)
    return out


if __name__ == "__main__":
    spark = get_spark("round15b-twinscale")
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.count()
    # Gate-aware replication: replicate_documents PREFIXES every token,
    # which destroys the stopwords the Gopher gate requires (10x corpus
    # -> 0 admitted, first run of this harness).  Instead intersperse a
    # replica-and-doc-unique token every 3rd word — the docgate
    # readout's own construction: stopwords survive (gate passes) while
    # every 5-shingle carries a token no other replica has (near-dup
    # bands cannot fire across replicas).
    def replicate_for_gate(d, n):
        # n=1 gives the sf0.1 baseline the SAME marker construction,
        # so the two scales compare like-for-like
        r = d.crossJoin(F.broadcast(
            spark.range(n).select(F.col("id").alias("_rep"))
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
            (F.col("doc_id") + F.col("_rep") * F.lit(10_000_000)).alias(
                "doc_id"
            ),
            tagged.alias("text"),
        )

    results = []
    for label, d in (
        ("sf0.1", replicate_for_gate(docs, 1)),
        ("sf1", replicate_for_gate(docs, N_REPLICAS)),
    ):
        results.append(run_doc_gate(spark, d, label))
        print(json.dumps(results[-1]), flush=True)
    ids = docs.select("doc_id")
    from tools.streaming_twin_scale import replicate_ids

    for label, d in (
        ("sf0.1", ids),
        ("sf1", replicate_ids(ids, ["doc_id"], N_REPLICAS)),
    ):
        results.append(run_image_gate(spark, d, label))
        print(json.dumps(results[-1]), flush=True)
    by = {(r["twin"], r["scale"]): r for r in results}
    print("\n| twin | corpus 10x | state rows x | state bytes x | last-batch x |")
    print("|---|---|---|---|---|")
    for twin in ("doc_gate", "image_gate"):
        s, l = by[(twin, "sf0.1")], by[(twin, "sf1")]
        print(
            f"| {twin} | {s['corpus_rows']}→{l['corpus_rows']} "
            f"| {s['state_rows']}→{l['state_rows']} "
            f"({round(l['state_rows'] / max(1, s['state_rows']), 1)}x) "
            f"| {round(l['state_bytes'] / max(1, s['state_bytes']), 1)}x "
            f"| {s['last_batch_s']}→{l['last_batch_s']} "
            f"({round(l['last_batch_s'] / max(0.001, s['last_batch_s']), 1)}x) |"
        )
