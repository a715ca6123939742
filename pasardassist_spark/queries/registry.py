"""Query registry — binds every implemented operator to the driver contract.

Each entry is a named PySpark query ``fn(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) an equivalent DuckDB oracle SQL string. The driver
hash-compares both at sf0.01 (row count + schema + order-insensitive value
hash), so:

- every computed column is aliased identically on both sides;
- money aggregates use the decimal-exact pattern (functions/money.py);
- every sort feeding a LIMIT has an explicit total order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => not SQL-expressible; driver does rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}

# The driver checks only the FIRST `DRIVER_WINDOW` entries of `queries()` in
# dict order.  Round 2 learned this the hard way: the registry grew past 50
# and the whole timeseries module plus the text tail silently fell outside
# the correctness gate.  `all_queries()` therefore emits entries in priority
# order: anything NOT yet driver-verified (or changed since its last green
# driver row) first, then the archived-green remainder.  A pytest guard
# (tests/test_oracle_parity.py) fails if an unverified entry lands outside
# the window.
DRIVER_WINDOW = 50

# Names with a green driver row (hash-green in CORRECTNESS_r01..r04, or the
# rows-only-by-design entries the driver row-checked).  An entry stays here
# only while its query code AND oracle are unchanged; when either is edited,
# move the name to _FORCE_RECHECK for one round.
_DRIVER_GREEN: frozenset[str] = frozenset({
    # r2 greens (events-free, untouched since)
    "q1_pricing_summary", "a3_distinct_buyers", "a3_approx_distinct",
    "a4_lowest_price", "a7_earnings_case", "a10_attribute_counts",
    "a11_collection_stats", "a12_wallet_dashboard", "s5_royalty_fanout",
    "a9_rarity_map", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_embcos_exact", "dedup_embcos_lsh",
    "a8_weighted_volume", "mm_decode_features", "mm_resize_thumbs",
    "mm_frame_sample", "p_project_compute", "f_predicates",
    "f_keyword_search", "f8_key_tuples", "j1_orders_customer",
    "j3_latest_order_per_customer", "j4_customers_no_orders",
    "j5_sale_flags", "j6_region_rollup", "o1_sort_multikey",
    "o2_pagination", "o3_top5_per_group", "o4_count_and_page",
    "u2_single_pass_classes", "f6_attribute_filter", "samp_deterministic",
    "samp_class_cap", "sim_cosine_topk", "sim_lsh_ann", "sim_ivf_ann",
    "text_token_stats",
    # r4 greens
    "dedup_simhash", "dedup_simhash_pairs", "text_lang_id",
    "text_quality", "text_fingerprint", "text_repetition",
    "text_bpe_token_count", "text_unigram_logprob", "text_vocab_topk",
    "text_bm25_topk", "curate_corpus", "pack_training_sequences",
    "pii_redact", "dedup_clusters", "split_by_cluster", "dedup_passages",
    "contamination_flags", "mix_sources", "dedup_semantic", "sim_ivfpq_ann",
    # r5 greens (CORRECTNESS_r05: 43 hash-green + 7 rows-only re-checked)
    "a13_percentiles", "a5_latest_event", "a6_salted_latest_per_type",
    "a9_event_type_pivot", "aj_rate_asof", "attr_multi_touch",
    "cdc_snapshot_diff", "chunk_documents", "cohort_retention",
    "curate_dsir_weights", "dedup_incremental", "dq_quality_checks",
    "emb_normalize_quantize", "funnel_conversion", "gs_customer_rollup",
    "hh_heavy_hitters", "hist_equi_depth", "hist_value_buckets",
    "hop_window_rollup", "j2_composite_key", "rj_session_assign",
    "run_distinct_users", "s4_enrich_join", "samp_reservoir_per_group",
    "scalar_funcs", "sess_gap_sessionize", "src_jsonl_roundtrip",
    "st1_stream_replay", "st3_stream_rollup", "st4_entity_fold",
    "st7_retry_enrichment", "stat_moments", "text_bigram_logprob",
    "text_tfidf_keywords", "time_multi_rollup", "u1_union_timeline",
    "u3_attribution_join", "u4_retention_set_ops",
    "w2_value_window_analytics", "w_rank_distributions",
    "a13_percentiles_approx", "bpe_train_merge_table", "hh_space_saving",
    "hll_user_rollup",
    # r6 greens (CORRECTNESS_r06: 45 hash-green + 4 rows-only-by-design
    # re-row-checked; the one red, emb_pca_project, stays unarchived)
    "cube_market_rollup", "w3_pareto_share", "stat_linreg", "mad_outliers",
    "funnel_latency", "cohort_ltv", "dedup_debounce", "src_csv_roundtrip",
    "src_orc_roundtrip", "idx_inverted_postings", "udtf_sentence_split",
    "dedup_span_ngrams", "dedup_setjoin_prefix", "curate_quality_classifier",
    "ab_proportion_ztest", "ab_cuped_adjust", "path_transitions",
    "rfm_segments", "path_ngrams", "j8_interval_overlap",
    "dedup_fuzzy_levenshtein", "stat_ks_test", "stat_chi2_independence",
    "search_hybrid_rrf", "o6_skyline_frontier", "mb_pair_lift",
    "graph_pagerank", "knn_label_classify", "stat_entropy",
    "dq_column_profile", "rj_price_band_pairs", "samp_weighted_reservoir",
    "scd2_build", "scd2_pit_lookup", "cm_sketch_freq", "qsketch_percentiles",
    "st8_incremental_stats", "sess_concurrency", "ts_gap_fill", "ts_ewma",
    "ts_zscore_anomaly", "ts_cusum", "ts_interpolate", "ts_twap",
    # r8 greens (CORRECTNESS_r08: 43 hash-green, 0 red; the round-8
    # library/multimodal promotions all recorded hash-green on their first
    # driver row, and the re-checked ANN/mm_decode_features rows came back
    # clean after the real retune/sniff changes)
    "pack_split_segments", "cep_match_pattern", "cdc_operator_diff",
    "batch_by_length", "drift_psi_readout", "link_records_clusters",
    "mm_decode_real", "mm_resize_real", "mm_dhash_dedup",
    "mm_dhash_near_pairs", "mm_video_frames", "mm_video_dedup",
    "mm_audio_features", "mm_audio_fp_dedup",
    # rows-only-by-design (no SQL oracle can exist), driver row-checked
    # clean in r07 AND r08; pytest-bounded (orthonormality / variance
    # optimality) — archived on the same policy as the sketch entries
    "emb_pca_project",
    # r9 greens (CORRECTNESS_r09: 45 hash-green, 5 rows-only-by-design,
    # 0 red.  The 12 round-9 debuts all hash-green on their first driver
    # row; the codec-surface re-checks (mm_* family) and the LSH
    # multi-probe recheck all came back clean)
    "text_lang_id_script", "text_boilerplate_strip", "dedup_containment",
    "curate_gopher_rules", "stat_mannwhitney_u", "stat_spearman_corr",
    "graph_triangle_count", "dq_benford_test", "u5_unpivot_metrics",
    "aj_nearest_rate", "ts_seasonal_decompose", "mm_gif_decode",
    # r10 greens (CORRECTNESS_r10: 41 hash-green; the mm_* numpy
    # re-checks, the triangle densification recheck, and the two stat
    # ADVICE-guard rechecks all came back clean)
    "src_avro_roundtrip", "text_source_overlap", "text_zipf_alpha",
    "text_html_extract", "text_oov_rate", "text_readability",
    "dedup_exact_substring", "dedup_soft_weights", "text_novelty_rate",
    "curate_c4_rules", "src_warc_roundtrip", "curate_url_dedup",
    "graph_triangle_doulion", "graph_kcore", "curate_ccnet_buckets",
    "src_tfrecord_roundtrip", "curate_fineweb_filters",
    "pipeline_web_extract_clean", "stat_welch_ttest", "stat_anova_oneway",
    "stat_theilsen_line", "stat_bootstrap_ci", "mix_unimax_weights",
    "mix_temperature_weights", "split_stratified_exact",
    "sketch_bloom_filter",
    # r10 rows-only-by-design (iterative training / seeded assignment /
    # whitening — no SQL form), driver row-checked clean in r10;
    # semantics pytest-pinned in their operator test files
    "unigram_train_vocab", "unigram_encode_corpus",
    "wordpiece_train_vocab", "graph_label_propagation",
    "pack_bfd_assignments", "samp_kcenter_coreset", "emb_zca_whiten",
    # r11 greens (CORRECTNESS_r11: 44 hash-green + 6 rows-only clean,
    # 0 red at HEAD 6ffd997 — the full document shelf, the codec wave,
    # the two library promotions, and the r10 _FORCE_RECHECK set all
    # recorded clean; pipeline_any_doc_extract's row was taken against
    # the sniff-routed dispatcher at that HEAD)
    "curate_kneser_ney_ppl", "text_pmi_collocations",
    "stat_mutual_information", "text_keyphrase_rake", "format_chat_sft",
    "src_webdataset_roundtrip", "doc_pdf_extract", "doc_docx_extract",
    "pipeline_doc_extract_clean", "doc_epub_extract",
    "doc_markdown_extract", "doc_latex_extract", "doc_rtf_extract",
    "doc_feed_extract", "pipeline_any_doc_extract", "doc_odt_extract",
    "doc_ics_extract", "cdc_state_travel_diff", "drift_history",
    "mm_jpeg_decode", "mm_mjpeg_frames", "mm_jpeg_progressive",
    "mm_audio_float", "mm_webp_decode", "mm_png_variants",
    "mm_gif_frames", "mm_audio_g711", "mm_audio_adpcm", "mm_tiff_decode",
    "mm_subtitle_cues", "mm_midi_features",
    # r11 rows-only-by-design re-checks, clean (wordpiece_encode_corpus's
    # r10 red fixed at the root — scalar projection + the Array/Map
    # output-column registry guard in tests/test_oracle_parity.py)
    "wordpiece_encode_corpus",
    # r12 greens (CORRECTNESS_r12: 46 hash-green + 4 rows-only-by-design
    # clean, 0 red at HEAD 066f2ca — the email shelf, the legacy-Office
    # [MS-CFB] shelf, the XLSX/PPTX typed extracts, FIM, mbox, and the
    # lang-ID v2 gate all recorded clean; the round-12 _FORCE_RECHECK set
    # (docx/webdataset/feed/webp/dispatchers/curate_corpus) all re-greened)
    "text_lang_id_v2", "src_mbox_roundtrip", "format_fim_spans",
    "doc_email_extract", "doc_email_attachments", "doc_email_threads",
    "pipeline_email_to_sft", "doc_xlsx_extract", "doc_xlsx_records",
    "doc_pptx_extract", "doc_pptx_notes", "doc_legacy_extract",
    "doc_xls_extract", "doc_msg_extract", "doc_cfb_streams",
    # r13 greens (CORRECTNESS_r13: 44 hash-green + 6 rows-only-by-design
    # clean, 0 red at HEAD 85dd5f2 — the stats/survival shelf, the
    # multimodal metadata extractor quartet, the lake-layout pair, the
    # XML source, mojibake repair, k-hop BFS, the two streaming gate
    # readouts, and every r13 _FORCE_RECHECK re-green)
    "curate_budget_select", "curate_robots_gate", "dq_table_checksum",
    "graph_khop_reach", "lake_skipping_effectiveness", "lake_zorder_layout",
    "ml_auc_roc", "mm_exif_extract", "mm_id3_tags", "mm_png_prompt_meta",
    "mm_wav_info_tags", "pipeline_attachment_extract", "src_xml_roundtrip",
    "stat_cohens_kappa", "stat_fdr_bh", "stat_gini_lorenz",
    "stat_kruskal_wallis", "stat_tost_equivalence",
    "streaming_docgate_readout", "streaming_imagegate_readout",
    "surv_kaplan_meier", "surv_logrank_test", "text_dedup_lines",
    "text_fix_mojibake", "ts_acf",
    # r13 rows-only-by-design (FastCDC chunk boundaries, IRLS training,
    # probe-curve tuning, Holt-Winters recurrence — no SQL form), driver
    # row-checked clean in r13; semantics pytest-pinned
    "dedup_cdc_chunks", "ml_logreg_irls", "sim_ivf_autotune",
    "ts_holt_winters",
    # r14 greens (CORRECTNESS_r14: 45 hash-green + 5 rows-only-by-design
    # clean, 0 red at HEAD 9967297 — the encrypted-document matrix
    # (OOXML agile+standard), the round-14 media walks (MP3 frames,
    # MP4 boxes, FLAC/Ogg, MKV/EBML), the hypothesis-testing shelf,
    # graph link-prediction/assortativity, naive Bayes, the watermark
    # readout, and every r14 _FORCE_RECHECK re-green)
    "doc_encrypted_extract", "graph_assortativity",
    "graph_link_prediction", "ml_naive_bayes", "mm_flac_ogg_meta",
    "mm_mkv_meta", "mm_mp3_frames", "mm_mp4_meta",
    "samp_neyman_allocation", "stat_brown_forsythe", "stat_cramers_v",
    "stat_cvm_2samp", "stat_friedman", "stat_hodges_lehmann",
    "stat_jarque_bera", "stat_mann_kendall", "stat_permutation_paired",
    "stat_runs_test", "stat_seasonal_mann_kendall",
    "streaming_watermark_readout", "ts_changepoint", "ts_ljung_box",
    "ts_page_hinkley",
    # r14 rows-only-by-design (k-means training, isotonic PAVA, PACF
    # recurrence — no SQL form), driver row-checked clean in r14;
    # numpy/brute-force twins pytest-pinned
    "ml_isotonic_calibration", "ml_kmeans", "ts_pacf",
    # r15 greens (CORRECTNESS_r15: 46 hash-green + 4 rows-only-by-design
    # re-row-checked, 0 red — the r15 debut codec readouts plus every
    # r15 _FORCE_RECHECK re-green)
    "mm_heif_meta", "mm_aiff_meta", "mm_ico_meta", "mm_svg_meta",
    # r16 greens (CORRECTNESS_r16: 46 hash-green + 4 rows-only-by-design
    # sketch re-checks, 0 red — the LSM replay debut plus every r16
    # _FORCE_RECHECK re-green)
    "st9_lsm_replay",
    # r17 greens (CORRECTNESS_r17: 44 hash-green + 6 rows-only clean,
    # 0 red — the privacy shelf debut, Fleiss' kappa, the streaming
    # k-anon readout; judge independently re-ran 12 of them).
    # privacy_mondrian_release re-enters via _FORCE_RECHECK (its output
    # changed to the r18 audit form).
    "stat_fleiss_kappa", "privacy_k_anonymity", "privacy_l_diversity",
    "privacy_t_closeness", "privacy_suppress_release", "privacy_dp_counts",
    "privacy_t_closeness_ordered", "streaming_kanon_readout",
    "privacy_mondrian_release",
    # r18 greens (CORRECTNESS_r18: 45 hash-green + 5 rows-only-by-design
    # tokenizer rows, 0 red — the 16 r18 debuts below all hash-green on
    # their first driver row; the r18 _FORCE_RECHECK set re-greened and
    # is cleared for r19)
    "stat_jonckheere", "stat_effect_sizes", "graph_hits",
    "ts_forecast_accuracy", "text_yule_k", "stat_mcnemar",
    "stat_kendall_tau", "stat_cronbach_alpha", "privacy_randomized_response",
    "ml_ridge_normal_eq", "stat_cochran_q", "stat_dunn_posthoc",
    "src_arrow_ipc_roundtrip", "text_good_turing", "privacy_dp_topk",
    "graph_adamic_adar",
})

# Entries whose implementation or oracle changed since their last green
# driver row — treated as unverified for ordering until re-checked.
#
# Round 10: the round-9 re-checks (the mm_* codec-guard family and the
# sim_lsh_ann multi-probe retune) all recorded clean in CORRECTNESS_r09,
# so the set starts empty.  Add a name here ONLY when its query fn or
# oracle actually changed this round.
_FORCE_RECHECK: frozenset[str] = frozenset({
    # Round 19 rotation: every r18 _FORCE_RECHECK name re-verified green
    # in CORRECTNESS_r18 (45 hash-green + 5 clean rows-only tokenizer
    # rows, 0 red), so the r18 set is cleared.
    #
    # (a) The r18 ADVICE gap: queries whose fn changed in the r18
    # optimization commits (staging persists, packed-long kcore keys,
    # reverted-with-notes edits) without entering the r18 recheck window
    # — the driver never re-certified them. All were oracle-green
    # locally during r18; fresh driver rows close the audit gap.
    "graph_kcore", "graph_triangle_count", "graph_triangle_doulion",
    "graph_assortativity", "graph_link_prediction", "mb_pair_lift",
    "sess_concurrency", "ml_naive_bayes", "stat_mann_kendall",
    "stat_seasonal_mann_kendall", "stat_mutual_information",
    "text_unigram_logprob", "text_bigram_logprob", "text_tfidf_keywords",
    "text_pmi_collocations", "curate_kneser_ney_ppl",
    "curate_ccnet_buckets", "drift_history", "dedup_cdc_chunks",
    "dedup_ngram_jaccard", "dedup_containment", "dedup_setjoin_prefix",
    "link_records_clusters",
    # (b) Round-19 optimization changes, each oracle-rematched locally at
    # sf0.01 + sf0.1 before landing:
    # - minhash bucket-grouping (pair generation without the self-join or
    #   the r18 persist) — also flows into the cluster queries;
    "dedup_minhash_lsh", "dedup_clusters", "split_by_cluster",
    # - simhash_near_pairs: r19 measured the bucket-group form 20-25%
    #   slower (hot-slice skew) and kept the r18 join+persist — changed
    #   vs the r17-green form, so it still needs one driver row;
    "dedup_simhash_pairs",
    # - distinct-name-pair levenshtein (decide-small, fan ids back);
    "dedup_fuzzy_levenshtein",
    # - mondrian per-round validity fused into one aggregate;
    "privacy_mondrian_release",
    # - shared PQ training sample (bit-identical matrix, results
    #   unchanged; rows-only row re-certifies the build path).
    "sim_ivfpq_ann",
    # - the documents fan-out pushdown fence (tables.py): results
    #   invariant (always-true partition-id filter) but the executed
    #   plan of the heavy-gate query changed materially, so the driver
    #   re-certifies it (the r18 khop precedent).
    "curate_corpus",
})


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def needs_driver_check(name: str) -> bool:
    return name not in _DRIVER_GREEN or name in _FORCE_RECHECK


def _ordered() -> list[str]:
    """Registry names, never-driver-verified (and changed) entries first."""
    names = list(REGISTRY)
    return sorted(names, key=lambda n: (not needs_driver_check(n), names.index(n)))


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: REGISTRY[name].fn for name in _ordered()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: REGISTRY[name].oracle for name in _ordered() if REGISTRY[name].oracle
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from pasardassist_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        connectors,
        curation,
        dedup,
        documents,
        enrichment,
        experiments,
        lakeopt,
        library,
        matching,
        mining,
        multimodal,
        privacy,
        quality,
        relational,
        sampling,
        scd,
        similarity,
        sketches,
        text,
        timeseries,
        trends,
    )

    _LOADED = True
