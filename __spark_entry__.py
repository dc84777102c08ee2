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
# (~50 queries). Entries that have never received a driver CORRECTNESS
# row run FIRST so every §2 item accumulates at least one hard
# verification across rounds; round-1-only greens come next (refresh),
# and the already re-verified round-2 greens go last.
_VERIFY_FIRST = [
    # new in round 3 — no driver row yet
    "dedup_substring_spans",
    "dedup_containment",
    "dedup_bloom_incremental",
    "simhash_accuracy_eval",
    "events_top_paths",
    "embedding_correlation_pairs",
    "embedding_pca_top_component",
    "events_markov_transitions",
    "events_hourly_anomaly",
    "remote_wide_types",
    "remote_filter_mixed_pushdown",
    "remote_command_table_schema",
    "stream_doc_quality_gate",
    "stream_stream_attribution",
    "events_gap_fill_locf",
    "dedup_cross_source_overlap",
    "adaptive_lsh_recall_eval",
    "doc_length_histogram",
    "bm25_topk",
    "tfidf_top_terms",
    "hybrid_search_rrf",
    "quality_perplexity_buckets",
    "embedding_dim_stats",
    "text_entropy_score",
    "corpus_language_confusion",
    "embedding_outlier_zscore",
    "ann_pq_cosine",
    "stream_near_dedup",
    "pq_recall_eval",
    "kmeans_inertia_eval",
    "tokenize_bpe_train",
    "tokenize_bpe_apply",
    "stream_join_remote_dim",
    "ann_ivfpq_cosine",
    # §2.B — registered in round 2, never reached by the driver budget
    "q8_market_share",
    "q11_important_stock",
    "q12_late_shipping",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_count",
    "q19_disjunctive_revenue",
    "q20_promo_suppliers",
    "q21_waiting_suppliers",
    "events_funnel",
    "retention_cohorts",
    "window_analytics",
    "agg_cube",
    # §2.C — registered in round 2, never reached
    "dedup_keep_best",
    "ann_recall_eval",
    "sample_stratified",
    "train_test_split_group",
    "doc_chunk_tokens",
    "quality_filter_gopher",
    "quality_repetition_signals",
    "sample_temperature_mix",
    "kmeans_embeddings",
    "cluster_balanced_sample",
    "global_shuffle_shards",
    "text_pii_redact",
    "embedding_normalize",
    "embedding_quantize_int8",
    "line_dedup_boilerplate",
    "decontaminate_ngram_overlap",
    "text_bigram_score",
    "pack_sequences",
    "corpus_mix_report",
    "corpus_clean_pipeline",
    "semdedup_embedding",
    "minhash_accuracy_eval",
    "multimodal_frame_sample",
]

# Green in round 1 only (driver budget skipped them in round 2): refresh
# these before re-running the round-2 greens.
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
