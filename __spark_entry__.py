"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). The real implementations live in ``datafusion_remote_table_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_remote_table_spark import plans

# The driver verifies queries in dict order under a per-round budget
# (~50 queries). Ordering policy (VERDICT r3 item 1+2): queries whose
# most recent driver row is FAIL outrank everything (a stale FAIL is the
# only hard negative signal on record); never-driver-verified queries come
# next so every §2 item accumulates at least one green row; then the
# oldest greens rotate through as refresh.
_VERIFY_FIRST = [
    # Round-9 rotation (VERDICT r8 item 2): exactly the 27 queries that
    # still have no driver CORRECTNESS row in any round — the r8 driver's
    # 50-row budget cleared the head of the r8 list; those 50 now have
    # fresh green rows and drop to the refresh tail of _VERIFY_SECOND.
    # Same relative order as round 8. All 27 pass the strict local sweep.
    # Round-9 additions queue BEHIND them; with a ~50-row driver budget
    # the backlog reaches ZERO this round and the remainder of the budget
    # lands on the oldest stale greens (_VERIFY_SECOND head — VERDICT r8
    # item 6).
    "inventory_abc_xyz",
    "events_spectral_peaks",
    "events_markov_stationary",
    "events_ab_heterogeneity",
    "events_markov_heldout_accuracy",
    "events_linear_attribution",
    "events_engagement_fatigue",
    "demand_pattern_classification",
    "events_lifetime_gamma_moments",
    "lineitem_price_index",
    "customer_tier_migration",
    "dedup_prefix_filter_join",
    "dedup_sorted_neighborhood",
    "privacy_l_diversity_audit",
    "quality_score_calibration",
    "sample_mmr_diverse_topk",
    "multimodal_aspect_bucket_plan",
    "events_prefixspan_subsequences",
    "sample_ht_estimator_audit",
    # round-8 additions, still never driver-verified
    "events_entropy_rate",
    "orders_newsvendor_plan",
    "sample_neyman_allocation",
    "sample_dup_aware_weights",
    "dedup_capture_recapture",
    "text_js_divergence_sources",
    "multimodal_color_histogram_census",
    "dedup_union_cascade_efficiency",
    # round-9 additions — queued BEHIND the backlog (VERDICT r8 item 2)
    "tokenize_unigram_train",
    "tokenizer_unigram_bpe_compare",
    "tokenize_unigram_apply",
    "dedup_url_canonical_census",
    "retrieval_ndcg_eval",
    "kmeans_silhouette_eval",
    "stream_url_host_monitor",
]

# Previously driver-green: refresh rotation once the never-verified
# backlog above is cleared (VERDICT r5 item 7 — no row should age past
# 3 rounds). Oldest rows first: the r1 originals, then early r2 rows.
_VERIFY_SECOND = [
    "null_handling",
    "window_lead_lag",
    "asof_join_events_orders",
    "range_join_price_bands",
    "q7_volume_shipping",
    "q9_product_profit",
    "q17_small_quantity",
    "q22_sales_opportunity",
    "q2_min_supplier",
    "skyline_parts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "ann_lsh_cosine",
    "ann_ivf_cosine",
    "embedding_similarity_join",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "text_langid",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "text_top_ngrams",
    "multimodal_decode_stub",
    # r2 rows, oldest-green tier two
    "remote_query_scan",
    "remote_table_scan",
    "remote_filter_pushdown",
    "remote_limit_pushdown",
    "remote_projection_pushdown",
    "remote_insert",
    "remote_join_local",
    "federated_multi_source",
    "remote_stream_scan",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "join_broadcast",
    "agg_distinct",
    "window_topn_per_group",
    "window_running_sum",
    "sort_limit",
    "union_set_ops",
    "subquery_exists",
    "case_expr_agg",
    "events_sessionize",
    "events_tumbling_window",
    "q4_order_priority",
    "q14_promo_revenue",
    "q18_large_orders",
    "agg_rollup",
    "pivot_orders_by_status",
    "json_extract_events",
    "agg_percentile",
    "stream_dedup_stateful",
    "stream_join_enrich",
    "stream_remote_sink",
    # r7 rows — the newest greens, refreshed last
    "embedding_knn_symmetry_audit",
    "doc_quality_ensemble",
    "multimodal_video_scene_cut",
    "stream_late_arrival_monitor",
    "remote_incremental_sync",
    "brand_price_volume_mix",
    "dedup_threshold_tradeoff_curve",
    "aqp_sample_error_audit",
    "ivm_join_delta",
    "orders_seasonal_naive_mase",
    "events_chisq_independence",
    "dedup_winnowing",
    "langid_feature_chi2",
    "text_keyword_rake",
    "events_bootstrap_ci",
    "remote_checksum_reconcile",
    "stream_seasonal_baseline_monitor",
    "basket_triples_apriori",
    "lineitem_ols2",
    "lineitem_corr_matrix",
    "events_sequence_trigrams",
    "doc_length_lognormal_fit",
    "multimodal_image_contrast",
    "winnowing_accuracy_eval",
    "federated_ship_plan",
    "orders_littles_law",
    "events_funnel_wilson_ci",
    "events_shapley_attribution",
    "events_ab_power_mde",
    "remote_add_column_backfill",
    "sample_pps_systematic",
    "doc_length_wasserstein",
    "stream_cusum_monitor",
    "shard_consistent_hash_audit",
    "events_mannwhitney_u",
    "multimodal_decode_error_audit",
    "minhash_1bit_eval",
    "text_burrows_delta",
    "join_order_dp_plan",
    "events_dispersion_fano",
    "events_diff_in_diff",
    "embedding_quantization_ladder",
    "lineitem_twoway_anova",
    "events_variance_decomposition",
    "orders_kendall_tau",
    "events_runs_test",
    "remote_diff_drilldown",
    "orders_expected_shortfall",
    "minhash_splithalf_reliability",
    "events_seasonal_adjusted_anomaly",
    # r8 rows — the newest greens, refreshed last
    "orders_pacf_durbin",
    "federated_topk_orders",
    "winnowing_minhash_agreement",
    "events_levene_test",
    "orders_kruskal_wallis",
    "idf_shard_stability",
    "remote_predicate_pushdown",
    "remote_insert_select",
    "remote_delete_pushdown",
    "remote_update_pushdown",
    "remote_schema_drift_audit",
    "remote_partition_balance_audit",
    "federated_partial_agg",
    "stream_decayed_popularity",
    "stream_lang_entropy_monitor",
    "stream_srm_monitor",
    "stream_theta_distinct_monitor",
    "stream_spectral_monitor",
    "query_expansion_prf",
    "curriculum_phase_plan",
    "sample_label_balance",
    "embedding_margin_audit",
    "tokenizer_fertility_audit",
    "ann_sq8_rerank_eval",
    "ngram_crossval_perplexity",
    "doc_language_entropy_by_source",
    "context_window_utilization",
    "corpus_dp_noisy_counts",
    "embedding_cluster_purity",
    "multimodal_phash_neardup",
    "embedding_pq_codebook_balance",
    "dedup_mix_shift_report",
    "theta_sketch_set_ops",
    "vocab_cutoff_coverage",
    "embedding_exact_dup_census",
    "text_burstiness_dispersion",
    "ann_filtered_search_eval",
    "dedup_quality_interaction",
    "sample_seed_stability",
    "multimodal_audio_silence_profile",
    "orders_snapshot_asof",
    "supplier_herfindahl",
    "orders_keyspace_gap_audit",
    "lineitem_reorder_point",
    "events_power_users_pareto",
    "events_value_winsorized_stats",
    "events_ab_srm_check",
    "part_single_source_risk",
    "orders_cohort_ltv",
    "lineitem_temporal_dq_audit",
]


def _ordered(mapping: dict) -> dict:
    priority = [n for n in _VERIFY_FIRST + _VERIFY_SECOND if n in mapping]
    rest = [n for n in mapping if n not in set(priority)]
    return {n: mapping[n] for n in priority + rest}


def _registry():
    plans.load_all()
    return _ordered(plans.QUERIES), _ordered(plans.ORACLE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    queries, _ = _registry()
    return queries["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = _registry()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    _, o = _registry()
    return dict(o)
