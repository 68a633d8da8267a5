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
# Round-9 rotation (VERDICT r8 "Next round #2"): the surface is FROZEN this
# round — zero new queries — and the ENTIRE 50-slot sample goes to stale
# evidence. Ordering regenerated from CORRECTNESS_r01..r08.json:
#   tier 0 = the 15 queries NEVER driver-sampled (r7 additions; the two
#            missing from the old list — pacf_durbin_levinson,
#            permutation_test_daily — now included; highest plan-complexity
#            first per the verdict: ann_ivfadc, unigram_encoding_apply),
#   tier 1 = the 26 queries whose latest driver green is round 2 (the
#            refactored dedup/minhash/cosine/ANN block leads:
#            ngram_jaccard_pairs was REWRITTEN in r6 with zero post-rewrite
#            driver evidence),
#   tier 2 = the 9 oldest round-3 queries (most-refactored ML/graph first:
#            louvain_communities re-optimized twice since its last sample).
# 15 + 26 + 9 = exactly the 50-slot sample. The remainder follows in
# oldest-evidence order (rest of r3, then r4, r5, r6, r8) so a wider
# sample — or round 10's regeneration — continues the rotation.
_PRIORITY = (
    # -- tier 0: never driver-sampled (15)
    "ann_ivfadc",
    "unigram_encoding_apply",
    "ann_ivf_pq",
    "unigram_lm_tokenizer",
    "star_connected_components",
    "stream_near_dup_registry",
    "pacf_durbin_levinson",
    "permutation_test_daily",
    "gopher_quality_rules",
    "countmin_heavy_hitters",
    "winnowing_fingerprints",
    "distinct_ngram_diversity",
    "zipf_law_fit",
    "fuzzy_decontamination",
    "mixture_temperature_weights",
    # -- tier 1: latest driver evidence is round 2 (26)
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "cosine_topk",
    "dup_cluster_assignments",
    "bh_adjust",
    "sessionize",
    "stratified_sample",
    "ks_test",
    "quantile_thresholds",
    "variance_explained",
    "log_normalize",
    "grouped_regression",
    "exact_dedup",
    "fuzzy_name_pairs",
    "tfidf_top_terms",
    "monthly_rollup",
    "tumbling_window",
    "json_extract",
    "ann_ivf_bucketed",
    "rank_in_group",
    "topk_per_group",
    "top2_delta",
    "cumulative_frames",
    "lag_lead_delta",
    "rolling_time_range",
    "equidepth_histogram",
    # -- tier 2: oldest round-3 evidence (9) -> completes the 50-prefix
    "louvain_communities",
    "grouped_trend_fits",
    "factor_decomposition",
    "clustree_transitions",
    "pseudotime_lineages",
    "knn_snn_lisi",
    "spline_exact_recovery",
    "pca_exact_recovery",
    "harmony_null_correction",
    # -- beyond the 50-sample: rest of r3, then r4, r5, r6, r8 evidence order
    "loess_exact_recovery",
    "nth_event_snapshot",
    "null_ordering",
    "multiway_join_revenue",
    "top_orders_by_revenue",
    "reorder_to_input",
    "sliding_window",
    "session_window_native",
    "quantile_normalize",
    "grouped_correlation",
    "grouped_moments",
    "token_stats",
    "quality_score",
    "lang_id_ngram",
    "doc_fingerprint",
    "minhash_signature",
    "bpe_style_tokens",
    "chunk_documents",
    "benchmark_decontamination",
    "corpus_mixture_sample",
    "repetition_filter",
    "hierarchical_time_rollup",
    "cohort_retention",
    "min_per_group_join_back",
    "having_threshold_join",
    "distinct_suppliers_per_attr",
    "date_arithmetic",
    "embedding_stats",
    "label_centroids",
    "na_drop_subset",
    "array_row_aggs",
    "delta_from_median",
    "asof_join",
    "range_join_bands",
    "filter_scan_agg",
    "pairwise_ks",
    "simhash_signature",
    "knee_detection",
    "module_score",
    "asof_join_forward_tolerance",
    "grouped_quantiles",
    "distinct_rows",
    "group_sizes",
    "functional_dependency_check",
    "crosstab_proportions",
    "group_cv",
    "qc_metrics_bundle",
    "mds_exact_recovery",
    "start_vs_end_test",
    "condition_diff_recovery",
    "multimodal_decode_certificate",
    "media_dedup_certificate",
    "video_frame_sampling",
    "skew_salted_join",
    "train_holdout_split",
    "stream_stateful_dedup",
    "stream_custom_state_profile",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "boilerplate_strip",
    "vocab_coverage",
    "char_entropy_filter",
    "curation_pipeline",
    "strict_na_aggregation",
    "pairwise_ks_one_sided",
    "spline_trend_fits",
    "batch_correction",
    "pca_embedding",
    "denoised_feature_selection",
    "cca_anchor_identity",
    "cluster_blobs_certificate",
    "harmony_shift_recovery",
    "sweep_exact_recovery",
    "csv_roundtrip_scan",
    "jsonl_roundtrip_scan",
    "orc_roundtrip_scan",
    "converter_roundtrip",
    "audio_energy_certificate",
    "image_stats_certificate",
    "cluster_pipeline",
    "embedding_near_dup",
    "approx_sketch_aggs",
    "zorder_layout",
    "stream_tumbling_counts",
    "stream_session_windows",
    "stream_session_windows_append",
    "stream_curation_funnel",
    "stream_sliding_counts",
    "sequence_packing",
    "pii_scrub",
    "dedup_keep_best",
    "quality_classifier_filter",
    "bm25_retrieval",
    "importance_weights_dsir",
    "curated_export_roundtrip",
    "cross_doc_ngram_duplication",
    "lm_perplexity_filter",
    "bpe_merge_candidates",
    "corpus_datasheet",
    "line_level_dedup",
    "incremental_dedup_batch",
    "k_anonymity_audit",
    "windowed_event_dedup",
    "event_funnel_conversion",
    "event_transition_matrix",
    "event_pair_affinity",
    "daily_ewma_smoothing",
    "hourly_percentile_bands",
    "late_shipment_priority_counts",
    "priority_class_line_counts",
    "top_revenue_supplier",
    "important_part_values",
    "semantic_dedup_keep",
    "support_filter",
    "binned_agg",
    "grouping_sets_cube",
    "pseudobulk_sum",
    "ora_enrichment",
    "term_semantic_clusters",
    "pagerank_interactions",
    "triangle_count_knn",
    "leiden_refined_communities",
    "projection_variants",
    "per_column_quantiles",
    "stage_tally",
    "aligned_cbind",
    "random_subset",
    "mean_var_topk",
    "sample_distances",
    "ma_pairs",
    "grouping_rollup",
    "grouped_mode",
    "atlas_loader_pipeline",
    "qc_filter_pipeline",
    "filter_project",
    "conditional_expr",
    "string_ops",
    "pair_key_unite",
    "make_unique_names",
    "lookup_join",
    "left_join_agg",
    "semi_anti_join",
    "union_distinct",
    "set_difference",
    "melt_unpivot",
    "pivot_onehot",
    "freq_ordered_levels",
    "weighted_sample",
    "group_entropy",
    "mad_outliers",
    "zscore_squish",
    "bpe_training_rounds",
    "bpe_encoding_apply",
    "exact_substring_dedup",
    "lm_trigram_backoff_filter",
    "bloom_decontamination",
    "ewma_anomaly_flags",
    "rolling_correlation",
    "seasonal_decomposition",
    "theil_sen_trend",
    "customer_order_distribution",
    "sole_late_supplier_counts",
    "hard_negative_mining",
    "pairwise_cvm",
    "benford_digit_audit",
    "adamic_adar_link_prediction",
    "lpa_communities",
    "kcore_decomposition",
    "hits_hub_authority",
    "harmonic_closeness_seeds",
    "hll_cardinality_sketch",
    "partition_skew_audit",
    "join_fanout_audit",
    "spearman_rank_correlation",
    "chi_square_independence",
    "mann_whitney_u",
    "kruskal_wallis",
    "mann_kendall_trend",
    "jackknife_cv_se",
    "bootstrap_ci",
    "kaplan_meier_retention",
    "mutual_information_assoc",
    "proportions_ab_test",
    "welch_t_test",
    "brown_forsythe_levene",
    "fisher_exact_priority_late",
    "wilcoxon_signed_rank",
    "friedman_test",
    "logrank_test",
    "cochran_armitage_trend",
    "g_test_independence",
    "wordpiece_training_rounds",
    "simhash_hamming_pairs",
    "containment_prefix_pairs",
    "sorted_neighborhood_pairs",
    "naive_bayes_langid",
    "cdc_chunk_dedup",
    "roc_auc_quality_signal",
    "cross_source_ngram_overlap",
    "gini_source_inequality",
    "tokenizer_fertility",
    "curriculum_length_stages",
    "autocorrelation_lags",
    "cusum_changepoints",
    "ljung_box_test",
    "holt_linear_forecast",
    "holt_winters_seasonal",
    "periodogram_peak",
    "dtw_pairwise_distance",
    "isotonic_daily_fit",
    "kendall_tau_daily",
    "embedding_int8_quantization",
    "by_adjust_dependent",
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
