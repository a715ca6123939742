"""sf0.1 -> sf1-equivalent scaling rows for the round-10b/c newcomers the
BASELINE.md table still lacks (VERDICT r10 #8) plus this round's debuts
(BASELINE.md replica method — tools/round6..10_scale.py lineage).

Replica construction per table:
- documents: 10x with disjoint doc_ids and replica-prefixed tokens, so
  the word-TYPE table the WordPiece trainer aggregates grows genuinely
  10x (not just more rows of the same types);
- events: 10x verbatim values/timestamps under disjoint event_ids — the
  drift trajectory sees 10x rows per week and the bootstrap resamples a
  10x population;
- orders + lineitem: 10x with disjoint orderkey/custkey/suppkey spaces
  (the round-6 graph method), so the k-core co-occurrence graph grows
  nodes AND edges 10x and the state-travel diff maintains 10x keys.

Run: PYTHONPATH=/root/repo python tools/round11_scale.py
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
    "wordpiece_train_vocab",
    "wordpiece_encode_corpus",
    "text_readability",
    "stat_bootstrap_ci",
    "graph_kcore",
    "drift_history",
    "cdc_state_travel_diff",
    "mm_jpeg_decode",
    # late-round debuts (second scale pass)
    "mm_jpeg_progressive",
    "mm_mjpeg_frames",
    "mm_webp_decode",
    "mm_audio_float",
    "mm_png_variants",
    "mm_gif_frames",
    "doc_pdf_extract",
    "doc_docx_extract",
    "mm_audio_g711",
    "mm_audio_adpcm",
    "mm_tiff_decode",
    # round-11c debuts (third scale pass)
    "mm_subtitle_cues",
    "mm_midi_features",
    "doc_epub_extract",
    "doc_markdown_extract",
    "doc_latex_extract",
    "doc_rtf_extract",
    "doc_feed_extract",
    "pipeline_doc_extract_clean",
    "format_chat_sft",
    "curate_kneser_ney_ppl",
    "text_pmi_collocations",
    "stat_mutual_information",
    "src_webdataset_roundtrip",
]
# re-runs can skip the already-recorded prefix (BASELINE.md table rows)
QUERIES = QUERIES[int(os.environ.get("SPARK_GRAFT_SCALE_SKIP", "0")):]


def build_replica(spark) -> str:
    base = tempfile.mkdtemp(prefix="r11_scale_sf1_")
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
    SPARK = get_spark("round11-scale")
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
