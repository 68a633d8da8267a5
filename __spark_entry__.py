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
# Round-6 rotation (VERDICT r5 "Next round #1"): driver evidence ages as
# code is refactored underneath green queries, so the sample must re-prove
# the queries whose latest driver-green round is OLDEST. Ordering below is
# generated from CORRECTNESS_r01..r05.json: brand-new queries (never
# driver-sampled) first, then last-green-in-r1, r2, r3, r4; the round-5
# block follows in registry order. Regenerate next round the same way.
_PRIORITY = (
    # -- tier 0: NEW in round 6 — never driver-sampled, need first proof
    # (names appended here as they land this round)
    "bpe_training_rounds",  # r6: full iterative BPE training loop
    "exact_substring_dedup",  # r6: suffix-array-style window-fingerprint dedup
    "bpe_encoding_apply",  # r6: tokenizer apply side (vocab broadcast encode)
    "pagerank_interactions",  # r6: iterative graph centrality (5-round oracle)
    "ewma_anomaly_flags",  # r6: EWMA control-chart anomalies (planted spikes)
    "customer_order_distribution",  # r6: Q13-shape left-outer double agg
    "sole_late_supplier_counts",  # r6: Q21-shape EXISTS/NOT-EXISTS composite
    "lm_trigram_backoff_filter",  # r6: held-out stupid-backoff trigram LM
    "hard_negative_mining",  # r6: cross-label cosine top-k (contrastive data)
    "triangle_count_knn",  # r6: exact triangle counting on the SNN graph
    "bloom_decontamination",  # r6: broadcast-Bloom contamination scan
    "rolling_correlation",  # r6: rolling bivariate Pearson (6 shared-frame sums)
    "seasonal_decomposition",  # r6: classical additive trend/seasonal/residual
    "leiden_refined_communities",  # r6: Leiden refinement phase (algorithm=4 analog)
    "theil_sen_trend",  # r6: robust median-of-pairwise-slopes trend
    # -- last driver-green in round 1 (23 queries)
    "support_filter",
    "binned_agg",
    "grouping_sets_cube",
    "pseudobulk_sum",
    "ora_enrichment",
    "projection_variants",
    "per_column_quantiles",
    "stage_tally",
    "aligned_cbind",
    "random_subset",
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
    # -- last driver-green in round 2 (38 queries)
    "term_semantic_clusters",
    "mean_var_topk",
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
    "ks_test",
    "quantile_thresholds",
    "variance_explained",
    "log_normalize",
    "grouped_regression",
    "monthly_rollup",
    "tumbling_window",
    "json_extract",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "dup_cluster_assignments",
    "fuzzy_name_pairs",
    "tfidf_top_terms",
    "cosine_topk",
    "ann_ivf_bucketed",
    "rank_in_group",
    "topk_per_group",
    "top2_delta",
    "bh_adjust",
    "stratified_sample",
    "cumulative_frames",
    "lag_lead_delta",
    "sessionize",
    "rolling_time_range",
    "equidepth_histogram",
    # -- last driver-green in round 3 (38 queries)
    "grouped_trend_fits",
    "factor_decomposition",
    "clustree_transitions",
    "pseudotime_lineages",
    "louvain_communities",
    "knn_snn_lisi",
    "spline_exact_recovery",
    "pca_exact_recovery",
    "harmony_null_correction",
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
    # everything else (driver-green in r5) follows in registry order
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
