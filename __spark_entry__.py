"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything is delegated to the utils_spark package; the registry in
utils_spark/registry.py is the single source of truth so Spark callables
and oracle SQL can never drift apart.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Per-group multi-agg with exact quantiles (SURVEY §2.4 A1, the
    reference's canonical recipe R/utils.R:7-14), TPC-H Q1 shaped.
    """
    from utils_spark.registry import load_all

    registry = load_all()
    return registry["grouped_quantiles"].fn(spark, "/root/testdata/sf0.001")


# Least-verified-RECENTLY first: the driver samples a ~50-query prefix of
# this dict (rows+schema+hash vs the DuckDB oracle -> CORRECTNESS_r{N}).
# Round-11 rotation (VERDICT r10 "Next round #1"): regenerated mechanically
# by `python tools/gen_priority.py` from CORRECTNESS_r01..r10.json after
# the round-10 sample landed 50/50 green (burning down the r3/r4 block).
# Post-r10 latest-green histogram: r4: 13, r5: 50, r6: 50, r8: 50,
# r9: 50, r10: 50, never: 9 — so the 50-slot r11 sample is exactly the
# 13 r4-latest queries followed by the 37 oldest r5-latest; the remainder
# continues in oldest-evidence order (rest of r5, the 9 never-sampled
# round-10 additions at tier 5.5 per the VERDICT r9 soft-unfreeze rule,
# then r6, r8, r9, r10).
# Verify with `python tools/gen_priority.py --check` (must exit 0).
_PRIORITY = (
    "incremental_dedup_batch",  # r5
    "k_anonymity_audit",  # r5
    "windowed_event_dedup",  # r5
    "event_funnel_conversion",  # r5
    "event_transition_matrix",  # r5
    "event_pair_affinity",  # r5
    "daily_ewma_smoothing",  # r5
    "hourly_percentile_bands",  # r5
    "late_shipment_priority_counts",  # r5
    "priority_class_line_counts",  # r5
    "top_revenue_supplier",  # r5
    "important_part_values",  # r5
    "semantic_dedup_keep",  # r5
    "xml_roundtrip_scan",  # new
    "suffix_lcp_dedup",  # new
    "count_mean_sketch_frequency",  # new
    "split_leakage_audit",  # new
    "pretokenizer_token_counts",  # new
    "ngram_novelty_curve",  # new
    "stream_cms_sketch_state",  # new
    "margin_bitext_mining",  # new
    "ann_recall_audit",  # new
    "support_filter",  # r6
    "binned_agg",  # r6
    "grouping_sets_cube",  # r6
    "pseudobulk_sum",  # r6
    "ora_enrichment",  # r6
    "term_semantic_clusters",  # r6
    "pagerank_interactions",  # r6
    "triangle_count_knn",  # r6
    "leiden_refined_communities",  # r6
    "projection_variants",  # r6
    "per_column_quantiles",  # r6
    "stage_tally",  # r6
    "aligned_cbind",  # r6
    "random_subset",  # r6
    "mean_var_topk",  # r6
    "sample_distances",  # r6
    "ma_pairs",  # r6
    "grouping_rollup",  # r6
    "grouped_mode",  # r6
    "atlas_loader_pipeline",  # r6
    "qc_filter_pipeline",  # r6
    "filter_project",  # r6
    "conditional_expr",  # r6
    "string_ops",  # r6
    "pair_key_unite",  # r6
    "make_unique_names",  # r6
    "lookup_join",  # r6
    "left_join_agg",  # r6
    "semi_anti_join",  # r6
    "union_distinct",  # r6
    "set_difference",  # r6
    "melt_unpivot",  # r6
    "pivot_onehot",  # r6
    "freq_ordered_levels",  # r6
    "weighted_sample",  # r6
    "group_entropy",  # r6
    "mad_outliers",  # r6
    "zscore_squish",  # r6
    "bpe_training_rounds",  # r6
    "bpe_encoding_apply",  # r6
    "exact_substring_dedup",  # r6
    "lm_trigram_backoff_filter",  # r6
    "bloom_decontamination",  # r6
    "ewma_anomaly_flags",  # r6
    "rolling_correlation",  # r6
    "seasonal_decomposition",  # r6
    "theil_sen_trend",  # r6
    "customer_order_distribution",  # r6
    "sole_late_supplier_counts",  # r6
    "hard_negative_mining",  # r6
    "pairwise_cvm",  # r8
    "benford_digit_audit",  # r8
    "adamic_adar_link_prediction",  # r8
    "lpa_communities",  # r8
    "kcore_decomposition",  # r8
    "hits_hub_authority",  # r8
    "harmonic_closeness_seeds",  # r8
    "hll_cardinality_sketch",  # r8
    "partition_skew_audit",  # r8
    "join_fanout_audit",  # r8
    "spearman_rank_correlation",  # r8
    "chi_square_independence",  # r8
    "mann_whitney_u",  # r8
    "kruskal_wallis",  # r8
    "mann_kendall_trend",  # r8
    "jackknife_cv_se",  # r8
    "bootstrap_ci",  # r8
    "kaplan_meier_retention",  # r8
    "mutual_information_assoc",  # r8
    "proportions_ab_test",  # r8
    "welch_t_test",  # r8
    "brown_forsythe_levene",  # r8
    "fisher_exact_priority_late",  # r8
    "wilcoxon_signed_rank",  # r8
    "friedman_test",  # r8
    "logrank_test",  # r8
    "cochran_armitage_trend",  # r8
    "g_test_independence",  # r8
    "wordpiece_training_rounds",  # r8
    "simhash_hamming_pairs",  # r8
    "containment_prefix_pairs",  # r8
    "sorted_neighborhood_pairs",  # r8
    "naive_bayes_langid",  # r8
    "cdc_chunk_dedup",  # r8
    "roc_auc_quality_signal",  # r8
    "cross_source_ngram_overlap",  # r8
    "gini_source_inequality",  # r8
    "tokenizer_fertility",  # r8
    "curriculum_length_stages",  # r8
    "autocorrelation_lags",  # r8
    "cusum_changepoints",  # r8
    "ljung_box_test",  # r8
    "holt_linear_forecast",  # r8
    "holt_winters_seasonal",  # r8
    "periodogram_peak",  # r8
    "dtw_pairwise_distance",  # r8
    "isotonic_daily_fit",  # r8
    "kendall_tau_daily",  # r8
    "embedding_int8_quantization",  # r8
    "by_adjust_dependent",  # r8
    "grouped_trend_fits",  # r9
    "factor_decomposition",  # r9
    "clustree_transitions",  # r9
    "pseudotime_lineages",  # r9
    "louvain_communities",  # r9
    "knn_snn_lisi",  # r9
    "spline_exact_recovery",  # r9
    "pca_exact_recovery",  # r9
    "harmony_null_correction",  # r9
    "star_connected_components",  # r9
    "ks_test",  # r9
    "quantile_thresholds",  # r9
    "variance_explained",  # r9
    "log_normalize",  # r9
    "grouped_regression",  # r9
    "permutation_test_daily",  # r9
    "gopher_quality_rules",  # r9
    "countmin_heavy_hitters",  # r9
    "winnowing_fingerprints",  # r9
    "distinct_ngram_diversity",  # r9
    "zipf_law_fit",  # r9
    "exact_dedup",  # r9
    "ngram_jaccard_pairs",  # r9
    "minhash_lsh_pairs",  # r9
    "dup_cluster_assignments",  # r9
    "fuzzy_name_pairs",  # r9
    "tfidf_top_terms",  # r9
    "fuzzy_decontamination",  # r9
    "mixture_temperature_weights",  # r9
    "unigram_lm_tokenizer",  # r9
    "unigram_encoding_apply",  # r9
    "stream_near_dup_registry",  # r9
    "monthly_rollup",  # r9
    "tumbling_window",  # r9
    "json_extract",  # r9
    "pacf_durbin_levinson",  # r9
    "cosine_topk",  # r9
    "ann_ivf_bucketed",  # r9
    "ann_ivf_pq",  # r9
    "ann_ivfadc",  # r9
    "rank_in_group",  # r9
    "topk_per_group",  # r9
    "top2_delta",  # r9
    "bh_adjust",  # r9
    "stratified_sample",  # r9
    "cumulative_frames",  # r9
    "lag_lead_delta",  # r9
    "sessionize",  # r9
    "rolling_time_range",  # r9
    "equidepth_histogram",  # r9
    "na_drop_subset",  # r10
    "array_row_aggs",  # r10
    "delta_from_median",  # r10
    "asof_join",  # r10
    "range_join_bands",  # r10
    "filter_scan_agg",  # r10
    "pairwise_ks",  # r10
    "simhash_signature",  # r10
    "knee_detection",  # r10
    "module_score",  # r10
    "asof_join_forward_tolerance",  # r10
    "grouped_quantiles",  # r10
    "distinct_rows",  # r10
    "group_sizes",  # r10
    "functional_dependency_check",  # r10
    "crosstab_proportions",  # r10
    "group_cv",  # r10
    "qc_metrics_bundle",  # r10
    "loess_exact_recovery",  # r10
    "mds_exact_recovery",  # r10
    "start_vs_end_test",  # r10
    "condition_diff_recovery",  # r10
    "nth_event_snapshot",  # r10
    "null_ordering",  # r10
    "multiway_join_revenue",  # r10
    "top_orders_by_revenue",  # r10
    "reorder_to_input",  # r10
    "sliding_window",  # r10
    "session_window_native",  # r10
    "quantile_normalize",  # r10
    "grouped_correlation",  # r10
    "grouped_moments",  # r10
    "token_stats",  # r10
    "quality_score",  # r10
    "lang_id_ngram",  # r10
    "doc_fingerprint",  # r10
    "minhash_signature",  # r10
    "bpe_style_tokens",  # r10
    "chunk_documents",  # r10
    "benchmark_decontamination",  # r10
    "corpus_mixture_sample",  # r10
    "repetition_filter",  # r10
    "hierarchical_time_rollup",  # r10
    "cohort_retention",  # r10
    "min_per_group_join_back",  # r10
    "having_threshold_join",  # r10
    "distinct_suppliers_per_attr",  # r10
    "date_arithmetic",  # r10
    "embedding_stats",  # r10
    "label_centroids",  # r10
    "strict_na_aggregation",  # r11
    "pairwise_ks_one_sided",  # r11
    "spline_trend_fits",  # r11
    "batch_correction",  # r11
    "pca_embedding",  # r11
    "denoised_feature_selection",  # r11
    "cca_anchor_identity",  # r11
    "cluster_blobs_certificate",  # r11
    "harmony_shift_recovery",  # r11
    "sweep_exact_recovery",  # r11
    "csv_roundtrip_scan",  # r11
    "jsonl_roundtrip_scan",  # r11
    "orc_roundtrip_scan",  # r11
    "converter_roundtrip",  # r11
    "multimodal_decode_certificate",  # r11
    "media_dedup_certificate",  # r11
    "video_frame_sampling",  # r11
    "audio_energy_certificate",  # r11
    "image_stats_certificate",  # r11
    "cluster_pipeline",  # r11
    "embedding_near_dup",  # r11
    "approx_sketch_aggs",  # r11
    "skew_salted_join",  # r11
    "train_holdout_split",  # r11
    "zorder_layout",  # r11
    "stream_tumbling_counts",  # r11
    "stream_session_windows",  # r11
    "stream_session_windows_append",  # r11
    "stream_stateful_dedup",  # r11
    "stream_custom_state_profile",  # r11
    "stream_static_enrich",  # r11
    "stream_stream_interval_join",  # r11
    "stream_curation_funnel",  # r11
    "stream_sliding_counts",  # r11
    "sequence_packing",  # r11
    "pii_scrub",  # r11
    "boilerplate_strip",  # r11
    "dedup_keep_best",  # r11
    "vocab_coverage",  # r11
    "char_entropy_filter",  # r11
    "curation_pipeline",  # r11
    "quality_classifier_filter",  # r11
    "bm25_retrieval",  # r11
    "importance_weights_dsir",  # r11
    "curated_export_roundtrip",  # r11
    "cross_doc_ngram_duplication",  # r11
    "lm_perplexity_filter",  # r11
    "bpe_merge_candidates",  # r11
    "corpus_datasheet",  # r11
    "line_level_dedup",  # r11
)


def _ordered() -> dict:
    from utils_spark.registry import load_all

    reg = load_all()
    ordered = {n: reg[n] for n in _PRIORITY if n in reg}
    ordered.update((n, qd) for n, qd in reg.items() if n not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
