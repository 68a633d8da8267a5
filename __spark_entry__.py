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
# Round-7 rotation (VERDICT r6 "Next round #1"): driver evidence ages as
# code is refactored underneath green queries, so the sample must re-prove
# the queries whose latest driver-green round is OLDEST. Ordering below is
# generated from CORRECTNESS_r01..r06.json: brand-new queries (never
# driver-sampled) first, then last-green-in-r2 (26 queries — the
# refactored dedup/minhash/cosine/ANN block leads, per the verdict), then
# r3 (38, most-refactored ML/graph queries first), r4, r5; the round-6
# block follows in registry order. Regenerate next round the same way.
_PRIORITY = (
    # -- tier 0: NEW in round 8 — never driver-sampled, need first proof
    "partition_skew_audit",  # r8: pre-flight shuffle-key skew measurement
    "join_fanout_audit",  # r8: pre-join cardinality/fanout estimate
    "tokenizer_fertility",  # r8: per-language BPE fertility audit (Rust 2021)
    "curriculum_length_stages",  # r8: shortest-first curriculum staging audit
    "kendall_tau_daily",  # r8: tau-b concordance correlation, integer-exact S
    "pairwise_cvm",  # r8: Cramér-von Mises integrated ECDF-gap statistic
    "harmonic_closeness_seeds",  # r8: 3-hop multi-source BFS harmonic closeness
    "by_adjust_dependent",  # r8: Benjamini-Yekutieli FDR + BH certificate
    "gini_source_inequality",  # r8: exact Gini of doc length per source
    "cross_source_ngram_overlap",  # r8: source-level contamination matrix
    "g_test_independence",  # r8: log-likelihood-ratio independence test
    "isotonic_daily_fit",  # r8: minimax isotonic regression + certificate
    "dtw_pairwise_distance",  # r8: two-level-fold DTW + dtw<=euclid certificate
    "embedding_int8_quantization",  # r8: SQ8 + half-step bound certificate
    "roc_auc_quality_signal",  # r8: rank-based ROC-AUC of a quality signal
    "cdc_chunk_dedup",  # r8: content-defined chunking (Gear/FastCDC) dedup audit
    "holt_winters_seasonal",  # r8: additive HW triple smoothing, weekly m=7
    "periodogram_peak",  # r8: DFT periodogram dominant-frequency detector
    "wilcoxon_signed_rank",  # r8: paired signed-rank z per event type
    "friedman_test",  # r8: blocked k-treatment rank test (days as blocks)
    "logrank_test",  # r8: Mantel-Cox two-cohort survival comparison
    "cochran_armitage_trend",  # r8: ordered trend-in-proportions z
    "holt_linear_forecast",  # r8: Holt double-exponential trend forecast
    "fisher_exact_priority_late",  # r8: exact two-sided Fisher 2x2
    "ljung_box_test",  # r8: portmanteau whiteness Q over ACF lags 1..7
    "welch_t_test",  # r8: pairwise Welch unequal-variance t + W-S dof
    "brown_forsythe_levene",  # r8: median-centered Levene variance test
    # -- tier 0b: NEW in round 7 — never driver-sampled, need first proof
    # (names appended here as they land this round; latest additions first)
    "bootstrap_ci",  # r7: deterministic Poisson-bootstrap percentile CI
    "kaplan_meier_retention",  # r7: KM product-limit with right-censoring
    "mutual_information_assoc",  # r7: MI/NMI/Cramér's V effect sizes
    "proportions_ab_test",  # r7: two-proportion pooled z (A/B workhorse)
    "hits_hub_authority",  # r7: HITS hub/authority, generated 3-round oracle
    "naive_bayes_langid",  # r7: in-engine multinomial NB train+score
    "jackknife_cv_se",  # r7: delete-1 jackknife SE/bias for per-series CV
    "mann_whitney_u",  # r7: pairwise rank-sum U + tie-corrected z
    "kruskal_wallis",  # r7: k-group H via two-level distributed prefix-sum ranks
    "mann_kendall_trend",  # r7: S/z trend test pairing theil_sen_trend
    "sorted_neighborhood_pairs",  # r7: SNM blocking candidates + levenshtein verify
    "spearman_rank_correlation",  # r7: average-rank Spearman rho
    "chi_square_independence",  # r7: chi-square independence + contributions
    "kcore_decomposition",  # r7: k-core peel trajectory, data-derived k
    "benford_digit_audit",  # r7: Benford first-digit + chi-square audit
    "cusum_changepoints",  # r7: CUSUM level-shift detector, planted shifts
    "simhash_hamming_pairs",  # r7: banded SimHash Hamming pairs (cluster grain)
    "hll_cardinality_sketch",  # r7: explicit-register HyperLogLog + exact cert
    "wordpiece_training_rounds",  # r7: WordPiece likelihood-argmax trainer
    "containment_prefix_pairs",  # r7: asymmetric containment prefix filter
    "adamic_adar_link_prediction",  # r7: anchored AA link scores
    "lpa_communities",  # r7: synchronous label propagation, 4 rounds
    "autocorrelation_lags",  # r7: sample ACF lags 1..7 + white-noise band
    "ann_ivf_pq",  # r7: IVF-PQ quantized ANN (asymmetric-distance top-k)
    "unigram_lm_tokenizer",  # r7: unigram-LM (SentencePiece) EM trainer
    "star_connected_components",  # r7: large-star/small-star O(log n) CC
    "unigram_encoding_apply",  # r7: unigram apply side (word->toks dict)
    "ann_ivfadc",  # r7: true IVFADC (coarse routing + residual PQ ADC)
    "fuzzy_decontamination",  # r7: MinHash LSH train-vs-benchmark decon
    "mixture_temperature_weights",  # r7: XLM-R alpha=0.3 mixture weights
    "gopher_quality_rules",  # r7: Gopher filter set, published thresholds
    "countmin_heavy_hitters",  # r7: Count-Min sketch + overestimate cert
    "winnowing_fingerprints",  # r7: winnowing local fingerprints (MOSS)
    "distinct_ngram_diversity",  # r7: Distinct-1/2 corpus diversity
    "zipf_law_fit",  # r7: per-source Zipf exponent OLS fit
    "stream_near_dup_registry",  # r7: LIVE streaming LSH band registry
    # (dup_cluster_assignments, in the r2 block below, re-certifies the
    # swapped star CC on the real LSH dup graph this round)
    # -- last driver-green in round 2 (26 queries; rewritten-underneath first)
    "ngram_jaccard_pairs",  # REWRITTEN r6 (prefix filter) under r2-only evidence
    "minhash_lsh_pairs",
    "cosine_topk",
    "ann_ivf_bucketed",
    "dup_cluster_assignments",
    "exact_dedup",
    "bh_adjust",
    "sessionize",
    "stratified_sample",
    "fuzzy_name_pairs",
    "tfidf_top_terms",
    "tumbling_window",
    "cumulative_frames",
    "lag_lead_delta",
    "rolling_time_range",
    "rank_in_group",
    "top2_delta",
    "topk_per_group",
    "equidepth_histogram",
    "quantile_thresholds",
    "grouped_regression",
    "json_extract",
    "monthly_rollup",
    "log_normalize",
    "ks_test",
    "variance_explained",
    # -- last driver-green in round 3 (38 queries; refactored ML/graph first)
    "louvain_communities",
    "knn_snn_lisi",
    "pseudotime_lineages",
    "clustree_transitions",
    "factor_decomposition",
    "grouped_trend_fits",
    "spline_exact_recovery",
    "pca_exact_recovery",
    "harmony_null_correction",
    "loess_exact_recovery",
    "multiway_join_revenue",
    "top_orders_by_revenue",
    "nth_event_snapshot",
    "null_ordering",
    "reorder_to_input",
    "sliding_window",
    "session_window_native",
    "quantile_normalize",
    "grouped_correlation",
    "grouped_moments",
    "hierarchical_time_rollup",
    "cohort_retention",
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
    "min_per_group_join_back",
    "having_threshold_join",
    "distinct_suppliers_per_attr",
    "date_arithmetic",
    "embedding_stats",
    "label_centroids",
    # -- last driver-green in round 4 (34 queries)
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
    # -- last driver-green in round 5 (50 queries)
    "embedding_near_dup",
    "sequence_packing",
    "pii_scrub",
    "cca_anchor_identity",
    "cluster_blobs_certificate",
    "harmony_shift_recovery",
    "sweep_exact_recovery",
    "approx_sketch_aggs",
    "csv_roundtrip_scan",
    "stream_tumbling_counts",
    "stream_session_windows",
    "dedup_keep_best",
    "pca_embedding",
    "spline_trend_fits",
    "batch_correction",
    "denoised_feature_selection",
    "cluster_pipeline",
    "pairwise_ks_one_sided",
    "stream_session_windows_append",
    "converter_roundtrip",
    "quality_classifier_filter",
    "stream_curation_funnel",
    "strict_na_aggregation",
    "bm25_retrieval",
    "importance_weights_dsir",
    "curated_export_roundtrip",
    "cross_doc_ngram_duplication",
    "stream_sliding_counts",
    "lm_perplexity_filter",
    "bpe_merge_candidates",
    "semantic_dedup_keep",
    "zorder_layout",
    "jsonl_roundtrip_scan",
    "incremental_dedup_batch",
    "orc_roundtrip_scan",
    "audio_energy_certificate",
    "line_level_dedup",
    "corpus_datasheet",
    "late_shipment_priority_counts",
    "priority_class_line_counts",
    "top_revenue_supplier",
    "important_part_values",
    "image_stats_certificate",
    "windowed_event_dedup",
    "event_funnel_conversion",
    "event_transition_matrix",
    "k_anonymity_audit",
    "event_pair_affinity",
    "daily_ewma_smoothing",
    "hourly_percentile_bands",
    # everything else (driver-green in r6) follows in registry order
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
