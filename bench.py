"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (no driver collect, no
result materialization skew). One tiny warmup query amortizes codegen/JIT
and OS page-cache effects out of the first measurement.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pasardassist_spark import get_spark
from pasardassist_spark.queries import all_queries
from pasardassist_spark.tables import load

# Representative, scale-meaningful subset of the registry: one per operator
# family that dominates cost at 100 TB (wide agg, latest-per-key window,
# fact-fact join, union-sort, pivot, text scan, hash dedup, minhash chain,
# similarity scan, pandas-UDF stage).
HEADLINE = [
    "q1_pricing_summary",
    "a11_collection_stats",
    "j3_latest_order_per_customer",
    "j2_composite_key",
    "a12_wallet_dashboard",
    "j6_region_rollup",
    "u1_union_timeline",
    "o3_top5_per_group",
    "st4_entity_fold",
    "a9_event_type_pivot",
    "text_token_stats",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "mm_decode_features",
    # round-3 additions (VERDICT directive 9): the time-series operator
    # family gets regression numbers of its own.
    "aj_rate_asof",
    "rj_session_assign",
    "sess_gap_sessionize",
    "time_multi_rollup",
    "u3_attribution_join",
    # round-3 flagship LLM-pipeline additions. dedup_clusters is tracked by
    # pytest, not here: its driver-side CC iteration (~9 s at sf0.1) would
    # dominate the suite total without measuring a per-query plan.
    "curate_corpus",
    "pack_training_sequences",
    "contamination_flags",
    "text_repetition",
]


# Regression anchors (see the comment above the extras pass in main()):
# every name here must be a registered query — tests/test_oracle_parity.py
# guards membership so a typo cannot fail the driver's bench run.
EXTRA_NAMES = [
    # round-18 debuts
    "stat_jonckheere",
    "stat_effect_sizes",
    "graph_hits",
    "ts_forecast_accuracy",
    "text_yule_k",
    "stat_mcnemar",
    "stat_kendall_tau",
    "stat_cronbach_alpha",
    "privacy_randomized_response",
    "ml_ridge_normal_eq",
    "stat_cochran_q",
    "stat_dunn_posthoc",
    "src_arrow_ipc_roundtrip",
    "text_good_turing",
    "privacy_dp_topk",
    "graph_adamic_adar",
    # round-17 debuts: the privacy release-audit shelf
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_t_closeness",
    "privacy_suppress_release",
    "privacy_dp_counts",
    "privacy_t_closeness_ordered",
    "streaming_kanon_readout",
    "privacy_mondrian_release",
    "stat_fleiss_kappa",
    # round-14 second-session debuts
    "stat_permutation_paired",
    "graph_assortativity",
    "stat_hodges_lehmann",
    "stat_friedman",
    "stat_brown_forsythe",
    "stat_jarque_bera",
    "stat_cramers_v",
    "stat_cvm_2samp",
    "stat_runs_test",
    "ts_changepoint",
    "ts_pacf",
    "ml_kmeans",
    "ml_isotonic_calibration",
    "samp_neyman_allocation",
    "mm_mp4_meta",
    "mm_flac_ogg_meta",
    "mm_mkv_meta",
    # round-15 debuts
    "mm_heif_meta",
    "mm_aiff_meta",
    "mm_ico_meta",
    "mm_svg_meta",
    "dedup_passages",
    "dedup_clusters",
    "split_by_cluster",
    "text_bm25_topk",
    "pii_redact",
    "sim_ivfpq_ann",
    "funnel_conversion",
    "cohort_retention",
    "hh_heavy_hitters",
    "hh_space_saving",
    "hop_window_rollup",
    "cdc_snapshot_diff",
    "gs_customer_rollup",
    "text_bigram_logprob",
    "curate_dsir_weights",
    "hll_user_rollup",
    "chunk_documents",
    "samp_reservoir_per_group",
    "text_tfidf_keywords",
    "bpe_train_merge_table",
    "stat_moments",
    "attr_multi_touch",
    "run_distinct_users",
    "hist_equi_depth",
    # round-6 additions: one regression row per new operator family
    # (streaming st8 and the file-writing source roundtrips are
    # pytest-tracked instead — their cost is dominated by sink I/O,
    # not a query plan).
    "cube_market_rollup",
    "w3_pareto_share",
    "stat_linreg",
    "mad_outliers",
    "path_transitions",
    "path_ngrams",
    "rfm_segments",
    "scd2_build",
    "scd2_pit_lookup",
    "emb_pca_project",
    "cm_sketch_freq",
    "qsketch_percentiles",
    "ts_cusum",
    "ts_twap",
    "ts_interpolate",
    "o6_skyline_frontier",
    "mb_pair_lift",
    "graph_pagerank",
    "knn_label_classify",
    "dedup_setjoin_prefix",
    "stat_entropy",
    "dq_column_profile",
    "sess_concurrency",
    "rj_price_band_pairs",
    "funnel_latency",
    "cohort_ltv",
    "dedup_debounce",
    "j8_interval_overlap",
    "dedup_fuzzy_levenshtein",
    "stat_ks_test",
    "stat_chi2_independence",
    "search_hybrid_rrf",
    # round-8 additions: the promoted library-operator slots and the
    # real-codec multimodal stages get regression rows of their own.
    "cep_match_pattern",
    "cdc_operator_diff",
    "batch_by_length",
    "drift_psi_readout",
    "link_records_clusters",
    "mm_decode_real",
    "mm_resize_real",
    "mm_dhash_dedup",
    "mm_dhash_near_pairs",
    "mm_audio_features",
    "mm_audio_fp_dedup",
    "mm_video_frames",
    "mm_video_dedup",
    "pack_split_segments",
    # round-9 additions: the new oracle-checked operator slots
    "text_boilerplate_strip",
    "dedup_containment",
    "stat_mannwhitney_u",
    "aj_nearest_rate",
    "u5_unpivot_metrics",
    "mm_gif_decode",
    "curate_gopher_rules",
    "stat_spearman_corr",
    "graph_triangle_count",
    "text_lang_id_script",
    "dq_benford_test",
    "ts_seasonal_decompose",
    # round-10 additions
    "dedup_exact_substring",
    "curate_c4_rules",
    "src_warc_roundtrip",
    "graph_triangle_doulion",
    "curate_url_dedup",
    "curate_ccnet_buckets",
    "text_source_overlap",
    "mix_unimax_weights",
    "src_tfrecord_roundtrip",
    "text_zipf_alpha",
    "pack_bfd_assignments",
    "curate_fineweb_filters",
    "dedup_soft_weights",
    "text_html_extract",
    "unigram_train_vocab",
    "unigram_encode_corpus",
    "mix_temperature_weights",
    "text_oov_rate",
    "samp_kcenter_coreset",
    "sketch_bloom_filter",
    "pipeline_web_extract_clean",
    "emb_zca_whiten",
    "text_novelty_rate",
    "graph_label_propagation",
    # round-10 continuation, third batch
    "stat_welch_ttest",
    "stat_anova_oneway",
    "split_stratified_exact",
    "stat_theilsen_line",
    "src_avro_roundtrip",
    "graph_kcore",
    "wordpiece_train_vocab",
    "wordpiece_encode_corpus",
    "text_readability",
    "stat_bootstrap_ci",
    # round-11 debuts
    "mm_jpeg_decode",
    "mm_jpeg_progressive",
    "mm_mjpeg_frames",
    "mm_audio_float",
    "mm_webp_decode",
    "mm_png_variants",
    "drift_history",
    "cdc_state_travel_diff",
    "mm_gif_frames",
    "mm_tiff_decode",
    "mm_audio_g711",
    "mm_audio_adpcm",
    "doc_pdf_extract",
    "doc_docx_extract",
    "doc_epub_extract",
    "doc_markdown_extract",
    "pipeline_doc_extract_clean",
    "curate_kneser_ney_ppl",
    "mm_subtitle_cues",
    "format_chat_sft",
    "doc_latex_extract",
    "text_pmi_collocations",
    "stat_mutual_information",
    "src_webdataset_roundtrip",
    "mm_midi_features",
    "doc_rtf_extract",
    "doc_feed_extract",
    "pipeline_any_doc_extract",
    "doc_odt_extract",
    "text_keyphrase_rake",
    "doc_ics_extract",
    # round-12 debuts
    "doc_xlsx_extract",
    "doc_xlsx_records",
    "doc_pptx_extract",
    "doc_pptx_notes",
    "doc_email_extract",
    "doc_email_threads",
    "doc_email_attachments",
    "pipeline_email_to_sft",
    "src_mbox_roundtrip",
    "text_lang_id_v2",
    "format_fim_spans",
    "doc_cfb_streams",
    "doc_legacy_extract",
    "doc_xls_extract",
    "doc_msg_extract",
    # round-13 debuts (cheap, map/window shaped). The two heavier r13
    # composites are deliberately NOT anchored here: streaming_docgate_
    # readout (~24 s: 4 foreachBatch epochs) and sim_ivf_autotune
    # (~11 s: index build + exact ground truth) would add ~2 min per
    # bench run for regression signal the driver correctness gate
    # already provides.
    "curate_budget_select",
    "text_dedup_lines",
    "dedup_cdc_chunks",
    "surv_kaplan_meier",
    "surv_logrank_test",
    "stat_gini_lorenz",
    "stat_kruskal_wallis",
    "stat_fdr_bh",
    "ml_auc_roc",
    "ts_acf",
    "lake_zorder_layout",
    "lake_skipping_effectiveness",
    "mm_exif_extract",
    "mm_id3_tags",
    "text_fix_mojibake",
    "graph_khop_reach",
    "ml_logreg_irls",
    "src_xml_roundtrip",
    "dq_table_checksum",
    "mm_png_prompt_meta",
    "stat_cohens_kappa",
    "ts_holt_winters",
    "stat_tost_equivalence",
    "mm_wav_info_tags",
    # round-14 debuts
    "mm_mp3_frames",
    "doc_encrypted_extract",
    "ts_page_hinkley",
    "stat_mann_kendall",
    "graph_link_prediction",
    "ml_naive_bayes",
    "ts_ljung_box",
    "stat_seasonal_mann_kendall",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("pasardassist-bench")
    qs = all_queries()

    # warmup: touch the big table once (page cache + codegen paths) and spin
    # up the Python worker pool (fork + pandas/pyarrow import is a one-time
    # per-executor cost a long-lived cluster amortizes; without this it all
    # lands on whichever pandas-UDF query runs first).
    load(spark, sf_dir, "lineitem").count()
    from pyspark.sql import functions as F

    def _noop_pandas(batches):
        for pdf in batches:
            yield pdf

    spark.range(256).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        F.col("id")
    ).mapInPandas(_noop_pandas, "id long").write.format("noop").mode("overwrite").save()

    # One untimed warmup QUERY before the timed suite: the first timed query
    # otherwise absorbs the JVM's one-time whole-stage-codegen compiler
    # warmup (observed as a ~2x cold artifact on q1 in r2/r3). Run it at
    # sf0.001 so the warmup measures compilation, not data.
    qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    # Cold pass (comparable to the r01 baseline: includes per-query plan +
    # codegen compile), then a warm pass measuring steady-state execution —
    # the number that scales with data volume on a long-lived cluster, where
    # one-time compile cost amortizes to zero.
    # Persist hygiene (r17 VERDICT): several operators persist()
    # intermediates that outlive their terminal action (the returned plan
    # references them, so the operator cannot unpersist eagerly — the
    # full_sweep.py rationale). One long session timing 26 headline + ~230
    # extras entries would accumulate those blocks for its whole lifetime,
    # shadow-taxing every later entry. Drop them BETWEEN entries, outside
    # each timed window; queries are independent, so this also keeps the
    # warm numbers honest (no cross-pass cached-plan reuse).
    # r19: release_all = clearCache + unpersist of localCheckpoint block
    # RDDs, which clearCache alone leaves pinned for the session lifetime
    # (pasardassist_spark/caching.py — VERDICT r18 item 9). Same boundary,
    # same timing semantics (runs OUTSIDE every timed window); strictly
    # more hygiene, so a checkpointing query can no longer shadow-tax its
    # successors' memory either.
    from pasardassist_spark.caching import release_all

    def _clear() -> None:
        release_all(spark)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        _clear()

    # Warm: per-query MIN over two passes. The box this runs on is shared;
    # a single pass occasionally catches a multi-second host-contention
    # stall on one random query (observed: same query 1.4 s and 18 s in
    # back-to-back idle-machine runs, GC log clean). Min-of-2 reports the
    # query's actual steady-state cost, which is the number that scales.
    warm: dict[str, float] = {}
    for _ in range(2):
        for name in HEADLINE:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            warm[name] = min(warm.get(name, dt), dt)
            _clear()

    # Host-contention control (VERDICT r15 #7): the same anchor query,
    # re-measured at fixed points spread across the long extras pass, makes
    # the record self-adjudicating — when THIS round's control runs slower
    # than last round's recorded control on unchanged anchor code, the
    # per-query flags below are host shadow (page-cache/thermal state from
    # prior workloads), not regressions. Median of the samples, not min:
    # the control's job is to MEASURE contention, so it must not be robust
    # to it.
    CONTROL = "q1_pricing_summary"
    control_samples: list[float] = []

    def _control_sample() -> None:
        t0 = time.perf_counter()
        qs[CONTROL](spark, sf_dir).write.format("noop").mode("overwrite").save()
        control_samples.append(round(time.perf_counter() - t0, 3))

    # Regression anchors for the operator additions: timed outside the
    # headline totals (so cross-round totals stay comparable and
    # dedup_clusters' driver-side CC iteration doesn't dominate the
    # suite). Like the headline warm numbers, extras are the per-query
    # MIN over two full passes: a single pass re-admitted the host-
    # contention ambiguity the regressions field exists to kill (r9
    # flagged stat_entropy +110% with zero code change).
    extras: dict[str, float] = {}

    for _ in range(2):
        _control_sample()
        for name in EXTRA_NAMES:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            extras[name] = min(extras.get(name, dt), dt)
            _clear()
    _control_sample()

    # Silver-layout paths for the two slowest warm queries (both fact⋈fact):
    # the one-time bucketed write is the standing lake layout (untimed —
    # amortized across every future run of the reference's 10-min cron
    # workload); the timed number is the query consuming the bucketing.
    from pasardassist_spark.sources.lake import (
        a11_collection_stats_bucketed,
        j2_composite_key_bucketed,
        prepare_silver,
    )

    prepare_silver(spark, sf_dir)
    for name, fn in [
        ("a11_collection_stats_bucketed", a11_collection_stats_bucketed),
        ("j2_composite_key_bucketed", j2_composite_key_bucketed),
    ]:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            best = dt if best is None else min(best, dt)
            _clear()
        extras[name] = best

    def _min2(run) -> float:
        """Per-row min-of-2, same stability policy as the extras list."""
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            dt = round(time.perf_counter() - t0, 3)
            best = dt if best is None else min(best, dt)
            _clear()
        return best

    # Library-operator regression rows (no registry slot — the driver
    # window is full; timed here so the families still have numbers):
    # CEP contiguous match, record linkage, hard-negative mining.
    from pasardassist_spark.operators.cep import match_pattern
    from pasardassist_spark.operators.linkage import link_records
    from pasardassist_spark.operators.similarity import mine_hard_negatives

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    # distinct name from the registry's cep_match_pattern slot (3-step, no
    # budget): this row keeps the r6/r7 2-step + 1 h-budget series intact
    extras["cep_view_click_1h"] = _min2(lambda: match_pattern(
        ev, ["user_id"], ["us", "event_id"],
        [F.col("event_type") == "view", F.col("event_type") == "click"],
        id_col="event_id", time_col="us", within=3_600_000_000,
    ).write.format("noop").mode("overwrite").save())

    part = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_brand").alias("block"),
        F.col("p_name").alias("name"),
    )
    # typo-grade distance (2): the MDM operating point; TPC-H names are so
    # mutually close that dist 4 links ~half the table into dense cliques,
    # which measures the data's pathology, not the operator
    extras["link_records"] = _min2(lambda: link_records(
        part, ["block"], "id", "name", 2
    ).write.format("noop").mode("overwrite").save())

    extras["mine_hard_negatives"] = _min2(lambda: mine_hard_negatives(
        load(spark, sf_dir, "embeddings"), k=5
    ).write.format("noop").mode("overwrite").save())

    # tokenizer APPLICATION (train is benched as bpe_train_merge_table;
    # this times only the corpus-wide encode on the trained merges)
    from pasardassist_spark.operators.bpe import bpe_encode, train_bpe_merges
    from pasardassist_spark.queries.text import BPE_N_MERGES

    docs = load(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs, "text", BPE_N_MERGES)
    extras["bpe_encode_corpus"] = _min2(lambda: bpe_encode(
        docs, "text", merges, "doc_id"
    ).write.format("noop").mode("overwrite").save())

    # seeded global shuffle-shard (training export): one exchange +
    # per-shard sort
    from pasardassist_spark.operators.sharding import shuffle_shards

    extras["shuffle_shards"] = _min2(lambda: shuffle_shards(
        docs, "doc_id", 32, seed=1
    ).write.format("noop").mode("overwrite").save())

    # ANN quality + attribution (VERDICT r5 directive #7): rows-only driver
    # checks can't catch a silent recall regression, and the one-shot query
    # timings blur index build into search. Measure recall@10 against the
    # exact brute-force top-k, and time build (train+assign+encode,
    # persisted) separately from search (probe+score+rerank on the prebuilt
    # index — the steady-state serving cost; build amortizes once per
    # corpus generation).
    from pasardassist_spark.operators import similarity as S
    from pasardassist_spark.queries.similarity import DIM, K, QUERY_IDS

    emb = load(spark, sf_dir, "embeddings")
    exact = {
        (r.q_id, r.neighbor_id)
        for r in qs["sim_cosine_topk"](spark, sf_dir).collect()
    }
    ann: dict[str, dict[str, float]] = {}

    # sign-random-projection LSH (one-shot: bucket build is inline — its
    # tables are seeded hyperplanes, not a trained artifact, so there is
    # no build/search split to attribute)
    t0 = time.perf_counter()
    got = {
        (r.q_id, r.neighbor_id)
        for r in S.ann_topk(emb, QUERY_IDS, K, DIM).collect()
    }
    ann["sim_lsh_ann"] = {
        "recall10": round(len(exact & got) / len(exact), 3),
        "search_s": round(time.perf_counter() - t0, 3),
    }

    t0 = time.perf_counter()
    asg, cent = S.ivf_assignments(emb)
    asg = asg.persist()
    asg.count()
    build_s = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    got = {
        (r.q_id, r.neighbor_id)
        for r in S.ivf_topk(
            emb, QUERY_IDS, K, assignments=asg, centroids=cent
        ).collect()
    }
    ann["sim_ivf_ann"] = {
        "recall10": round(len(exact & got) / len(exact), 3),
        "build_s": build_s,
        "search_s": round(time.perf_counter() - t0, 3),
    }

    t0 = time.perf_counter()
    # r19: one shared training-sample collect (identical matrix -> the
    # rotation/books/codes are unchanged; the build previously collected
    # the same sample twice)
    trainX = S.pq_training_matrix(emb)
    rot = S.opq_rotation(emb, DIM, sample_X=trainX)  # round-12: OPQ alternation
    books = S.pq_codebooks(emb, DIM, rotation=rot, sample_X=trainX)
    codes = S.pq_encode(emb, books, rotation=rot).persist()
    codes.count()
    build_s = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    got = {
        (r.q_id, r.neighbor_id)
        for r in S.ivfpq_topk(
            emb, QUERY_IDS, K, DIM,
            books=books, assignments=asg, centroids=cent, codes=codes,
            rotation=rot,
        ).collect()
    }
    ann["sim_ivfpq_ann"] = {
        "recall10": round(len(exact & got) / len(exact), 3),
        # the PQ index reuses the IVF coarse quantizer; its build_s is the
        # OPQ-train + codebook + encode increment on top of sim_ivf_ann's
        "build_s": build_s,
        "search_s": round(time.perf_counter() - t0, 3),
    }
    asg.unpersist()
    codes.unpersist()

    # Like-for-like comparison set: the 17 queries the r1 baseline measured
    # (st4_latest_state has since merged into st4_entity_fold). The full
    # HEADLINE total grows as coverage grows; THIS subtotal is the number
    # comparable across rounds (r1: 37.078 s, r2: 26.368 s).
    baseline_subset = [
        "q1_pricing_summary", "a11_collection_stats",
        "j3_latest_order_per_customer", "j2_composite_key",
        "a12_wallet_dashboard", "j6_region_rollup", "u1_union_timeline",
        "o3_top5_per_group", "st4_entity_fold", "a9_event_type_pivot",
        "text_token_stats", "text_quality", "dedup_exact",
        "dedup_minhash_lsh", "dedup_simhash", "sim_cosine_topk",
        "mm_decode_features",
    ]
    total = round(sum(timings.values()), 3)

    # Per-query regression tracking vs the previous recorded run (VERDICT
    # r6 #6): the shared host occasionally doubles random untouched
    # queries, and without per-query deltas every round-over-round swing
    # is an unattributable judgment call. BENCH_LAST.json is this
    # harness's own full record of the previous run (the driver's
    # BENCH_r{N}.json keeps only a truncated tail); flagged = warm/extra
    # time grew >25% AND >0.5 s absolute.  Both gates are needed:
    # sub-second queries jitter past 25% on scheduler noise alone, and
    # even with warm min-of-2 this shared host swings multi-stage 2 s
    # queries by ~0.5 s with zero code change (r10: link_records
    # 1.80 -> 2.26 s, untouched since its baseline), so a flag below
    # that amplitude carries no signal.
    last_path = os.path.join(REPO, "BENCH_LAST.json")
    prev: dict = {}
    if os.path.exists(last_path):
        try:
            with open(last_path) as f:
                prev = json.load(f)
        except (OSError, json.JSONDecodeError):
            prev = {}
    if prev.get("sf") != sf:
        prev = {}  # cross-sf comparison is meaningless; don't fake deltas
    prev_times = {**prev.get("queries_warm", {}), **prev.get("queries_extra", {})}
    cur_times = {**warm, **extras}

    # Control readout + shadow/real adjudication. ratio_vs_prev compares
    # this run's control median to the PREVIOUS recorded run's — the anchor
    # query code rarely changes, so a ratio well above 1 means the host ran
    # this whole record slower (the r13-r15 "shadow" regime: BASELINE.md
    # adjudicated ~all such flags NOT REAL). A flagged query is then
    # classified `shadow` unless it grew 25% beyond what the host ratio
    # explains — those are the flags worth a tools/round15_ab.py-style
    # isolated re-measure.
    control_median = sorted(control_samples)[len(control_samples) // 2]
    prev_control = (prev.get("host_control") or {}).get("median_s")
    control_ratio = (
        round(control_median / prev_control, 3) if prev_control else None
    )
    host_control = {
        "anchor": CONTROL,
        "samples": control_samples,
        "median_s": control_median,
        "prev_median_s": prev_control,
        "ratio_vs_prev": control_ratio,
    }
    shadow_bar = (control_ratio or 1.0) * 1.25
    regressions = {
        name: {
            "prev_s": p,
            "cur_s": cur,
            "delta_pct": round((cur - p) / p * 100, 1),
            "verdict": (
                "unadjudicated" if control_ratio is None
                else "shadow" if cur / p <= shadow_bar
                else "real_suspect"
            ),
        }
        for name, cur in cur_times.items()
        if (p := prev_times.get(name)) and cur - p > 0.5 and (cur - p) / p > 0.25
    }

    # Extras runtime budget (r17 VERDICT #7): extras_total drifted
    # 234 -> 275 s across r16 -> r17 with only ~13 s of new queries; the
    # budget line makes the bench itself flag that drift instead of
    # round-over-round judging. Evaluated only on a settled host
    # (control ratio <= 1.05) — a contended record says nothing about
    # the code. Raise the budget deliberately when new queries land,
    # never implicitly.
    # r19 re-pin (VERDICT r18 item 7). Accounting: the 250 s budget was
    # pinned BEFORE the 16 r18 debuts landed (~+42 s measured on the r18
    # settled driver host), so it was red on every clean run — a budget
    # that is always red is no budget. This round's optimizations removed
    # ~50 s from the extras pass (fuzzy-levenshtein −9, mondrian −2,
    # ivfpq build −1.3, plus the settled-host haze delta); the settled
    # r19 measurement (host_control 0.93) is 265.8 s across 247 rows.
    # 290 = measured + ~9% headroom: green on a clean run, red on ~10%
    # real drift. Raise deliberately when debuts land, never implicitly.
    EXTRAS_BUDGET_S = 290.0
    extras_total = round(sum(extras.values()), 3)
    extras_budget = {
        "budget_s": EXTRAS_BUDGET_S,
        "total_s": extras_total,
        "within": (
            extras_total < EXTRAS_BUDGET_S
            if (control_ratio is None or control_ratio <= 1.05)
            else None  # host-contended record: budget not evaluable
        ),
    }

    # Stable per-query number (VERDICT r18 item 8): min over all three
    # timed executions (1 cold + 2 warm) — the steady-state cost with the
    # cold pass's host-stall/JIT jitter removed. ADDITIVE: `value` and
    # `queries` keep their cold single-pass semantics for cross-round
    # comparability; adjudicate per-query regressions on queries_min3
    # (full record) / value_min3 (summary line) instead of cold noise.
    min3 = {name: min(timings[name], warm[name]) for name in HEADLINE}

    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min3": min3,
        "value_min3": round(sum(min3.values()), 3),
        "queries_warm": warm,
        "queries_extra": extras,
        "ann": ann,
        "value_warm": round(sum(warm.values()), 3),
        "value_baseline_subset": round(
            sum(timings[n] for n in baseline_subset), 3
        ),
        "value_baseline_subset_warm": round(
            sum(warm[n] for n in baseline_subset), 3
        ),
        "n_queries": len(HEADLINE),
        "sf": sf,
        "regressions": regressions,
        "regressions_vs": prev.get("round"),
        "host_control": host_control,
        "extras_budget": extras_budget,
    }

    # The driver records only the LAST 2000 characters of stdout and parses
    # the final line as JSON; the full `result` dict overflowed that buffer
    # every round since r4 (BENCH_r04..r08 all show "parsed": null).  Print
    # a compact summary line that fits the buffer — the complete per-query
    # record lives in BENCH_LAST.json (written below) for the judge.
    summary = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "value_warm": result["value_warm"],
        "value_min3": result["value_min3"],
        "value_baseline_subset": result["value_baseline_subset"],
        "value_baseline_subset_warm": result["value_baseline_subset_warm"],
        "n_queries": len(HEADLINE),
        "n_extras": len(extras),
        "extras_total": extras_total,
        "extras_budget": extras_budget,
        "ann": ann,
        "regressions_n": len(regressions),
        "regressions_real_suspect": sorted(
            n for n, r in regressions.items() if r["verdict"] == "real_suspect"
        )[:5],
        "host_contention": control_ratio,
        "regressions_top": {
            n: regressions[n]["delta_pct"]
            for n in sorted(
                regressions, key=lambda n: -regressions[n]["delta_pct"]
            )[:3]
        },
        "sf": sf,
        "full_record": "BENCH_LAST.json",
    }
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1900:  # belt-and-braces: never overflow the tail again
        summary.pop("queries", None)
        line = json.dumps(summary, separators=(",", ":"))
    print(line)

    # Full record for next run's comparison (best-effort: a read-only
    # checkout must not break the bench output). Only the canonical sf0.1
    # driver configuration is recorded — ad-hoc runs at other scale
    # factors must not clobber the round-over-round anchor.
    if sf == 0.1:
        try:
            import subprocess

            sha = subprocess.run(
                ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or "unknown"
        except (OSError, subprocess.SubprocessError):
            sha = "unknown"
        try:
            with open(last_path, "w") as f:
                json.dump({**result, "round": sha}, f, indent=1)
        except OSError:
            pass


if __name__ == "__main__":
    main()
