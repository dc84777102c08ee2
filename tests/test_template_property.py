"""Cross-engine property test for the dual-engine SQL templates.

The correctness gate compares Spark against DuckDB on the FIXED
testdata; this harness feeds randomly generated corpora (hypothesis)
through a representative template set on both engines and asserts the
results agree — catching parity drift the fixed data can't reach (empty
and whitespace-only docs, sub-shingle lengths, repeated words, accent
characters, identical docs across sources).

Each example costs several Spark jobs, so max_examples stays small; the
generator is biased toward edge shapes rather than breadth.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_remote_table_spark.plans import llm_data as L

# small vocab with repeats + accents; '' and ' ' force the
# empty/whitespace tokenize edge
_WORDS = ["the", "data", "spark", "café", "naïve", "row", "the", "agg"]

_doc_text = st.one_of(
    st.just(""),
    st.just("   "),
    st.none(),  # NULL text rows occur in real corpora; NULL must propagate identically
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join),
)


@st.composite
def _corpus(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    texts = [draw(_doc_text) for _ in range(n)]
    if draw(st.booleans()) and n >= 2:
        texts[-1] = texts[0]  # identical pair across rows (dedup paths)
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "text": texts,
            "lang": [draw(st.sampled_from(["en", "de", "zh"])) for _ in range(n)],
            "source": [draw(st.sampled_from(["src0", "src1"])) for _ in range(n)],
            "n_chars": [len(t) if t is not None else 0 for t in texts],
        }
    )


def _sql_clean_funnel(E):
    """Inline both sides of corpus_clean_funnel (the registered Spark
    runner feeds staged views; the template composition is identical)."""
    return L._FUNNEL_SQL.format(src=L._sql_corpus_clean(E))


def _sql_dsir(E):
    return L._dsir_select(E, f"({L._dsir_buck_sql(E)})")


def _sql_nb_classifier(E):
    return L._nb_select(E, f"({L._dsir_buck_sql(E)})")


def _sql_span_runs(E):
    return L._span_runs_select(E, f"({L._span_pos_sql(E)})")


def _sql_span_clip(E):
    return L._span_clip_select(E, f"({L._span_pos_sql(E)})")


def _sql_span_clip_impact(E):
    return L._span_clip_impact_select(E, f"({L._span_pos_sql(E)})")


def _sql_curriculum_phases(E):
    return L._sql_curriculum(E, "DIV" if E is L._Spark else "//")


def _sql_ctx_window(E):
    return L._sql_ctx_window(E, "DIV" if E is L._Spark else "//")


def _sql_prefix_filter_full(E):
    """Inline composition of dedup_prefix_filter_join (the registered
    Spark runner rides staged views; the template math is identical)."""
    return (
        "WITH sh AS " + E.MAT + "(" + L._minhash_shingles(E) + "),"
        + L._prefix_filter_prefix(E, "sh") + ","
        + L._prefix_filter_tail(E, "pfx", "sh")
    )


def _sql_snm_full(E):
    return (
        "WITH sh AS " + E.MAT + "(" + L._minhash_shingles(E) + "),"
        + L._sql_snm_tail(E, "sh")
    )


def _sql_capture_recapture_full(E):
    """Inline composition of dedup_capture_recapture (the registered
    Spark runner rides staged views; the template math is identical)."""
    return (
        "WITH selfp AS " + E.MAT + "(" + L._winnow_fp_sql(E) + ")"
        + L._capture_recapture_tail(
            L._winnow_pairs4_sql(E, "selfp"),
            "SELECT doc_a, doc_b FROM (" + L._sql_minhash_oracle(E) + ") v",
        ).replace("WITH uni", ", uni", 1)
    )


def _sql_cascade_full(E):
    """Inline composition of dedup_union_cascade_efficiency (the Spark
    runner builds the union with DataFrame unionByName over checkpointed
    stagings; the set algebra is identical)."""
    return (
        "WITH selfp AS " + E.MAT + "(" + L._winnow_fp_sql(E) + "),\n"
        + "allp AS " + E.MAT + """(
      SELECT doc_a, doc_b, 1 AS st FROM ("""
        + L._exact_pairs_sql(E)
        + f""") e
      UNION ALL SELECT doc_a, doc_b, 2 FROM ({L._sql_simhash(E)}) s WHERE s.hamming <= 3
      UNION ALL SELECT doc_a, doc_b, 3 FROM ({L._winnow_pairs4_sql(E, "selfp")}) w
      UNION ALL SELECT doc_a, doc_b, 4 FROM ({L._sql_minhash_oracle(E)}) m
    ),
    """
        + L._cascade_tail("allp").lstrip()
    )


# templates whose inputs are just the documents table and whose outputs
# are deterministic under the repo's SUM/ROUND discipline
_TEMPLATES = [
    L._sql_token_count,
    L._sql_quality,
    L._sql_langid,
    L._sql_fingerprint,
    L._sql_entropy,
    L._sql_dedup_exact,
    L._sql_lang_confusion,
    L._sql_minhash_oracle,
    L._sql_bpe_train,
    L._sql_bpe_apply,
    L._sql_quality_filter,
    L._sql_repetition_signals,
    L._sql_line_dedup,
    L._sql_simhash,
    L._sql_quality_corr,
    L._sql_pack_sequences,
    L._sql_pack_bin_efficiency,
    L._sql_bpe_coverage,
    _sql_clean_funnel,
    L._sql_band_scurve,
    _sql_dsir,
    _sql_nb_classifier,
    _sql_span_runs,
    L._sql_epoch_plan,
    L._sql_ngram_novelty,
    L._sql_cooccurrence,
    L._sql_hll_distinct,
    L._sql_countmin,
    L._sql_readability,
    L._sql_code_detect,
    L._sql_compaction_plan,
    # round-4 sixth/seventh continuations: governance + sampling
    L._sql_zipf,
    L._sql_split_leakage,
    L._sql_doc_contract,
    L._sql_weighted_aes,
    L._sql_waterfill,
    L._sql_editdistance,
    L._sql_shard_balance,
    L._sql_reservoir_group,
    L._sql_assortativity,
    L._sql_lang_mixing,
    L._sql_method_agreement,
    L._sql_heaps,
    # round-5: PRF retrieval (empty seed hits, all-short vocab) and the
    # curriculum quartiles (single-value histograms, zero-token docs)
    L._sql_query_expansion,
    _sql_curriculum_phases,
    # round-5 (2): held-out LM scoring (empty train/eval splits), the
    # language-mix entropy, window utilization, and deterministic DP noise
    L._sql_crossval_ppl,
    L._sql_lang_entropy,
    _sql_ctx_window,
    L._sql_dp_counts,
    L._sql_burstiness,
    L._sql_seed_stability,
    # round-7: exact similarity join + blocked sorted-neighborhood
    # (empty/NULL docs exercise the empty-shingle-set prefix math),
    # calibration bins (degenerate one-bin corpora), HT strata (empty
    # samples), and the aspect-bucket dims/stride arithmetic
    _sql_prefix_filter_full,
    _sql_snm_full,
    L._sql_quality_calibration,
    L._sql_ht_audit,
    L._aspect_oracle,
    # round-8: stratified-design arithmetic (all-equal n_chars kill the
    # sds; single-doc strata vanish), pairwise JS divergence (single-
    # source corpora produce an empty grid; exclusive-word ln terms),
    # capture-recapture (zero-capture corpora hit the 0-guards), the
    # cost-ordered cascade union, and the color-census md5 derivation
    L._sql_neyman,
    L._sql_js_divergence,
    _sql_capture_recapture_full,
    _sql_cascade_full,
    L._sql_color_hist_oracle,
    # round-9: the URL canonicalization census (regexp_extract parity
    # over synthesized variants). The three unigram-tokenizer templates
    # are NOT fuzzed here (same reason as _gs_oracle): their inline
    # spelling re-expands the census->vocab->bestlen chain once per
    # walk-step reference inside Catalyst (~70 expansions on 8-row
    # tables), costing minutes of pure plan time per example — the
    # registered runners are checkpointed and covered by the sf0.001 +
    # sf0.01 oracle suites, and the DuckDB side (where the round-9
    # list_reduce parallelism bug actually lived) is fuzzed against a
    # pure-Python reference in test_unigram_walk_matches_reference.
    L._sql_url_census,
    # round-10: the substring-clip rewrite (interval-merge arithmetic —
    # tiny corpora exercise zero-clip outputs, whole-doc clips, and the
    # overlap-merge window on adjacent duplicated runs)
    _sql_span_clip,
    # round-10 (2): the clip's source rollup (all-unclipped corpora hit
    # the zero-COALESCE denominators)
    _sql_span_clip_impact,
]


def _collect_parallel(named_dfs, max_workers: int = 8) -> dict:
    """toPandas each (label, DataFrame) through a thread pool (guide
    §2.6 — actions on one session are independent jobs the scheduler
    overlaps). Each example costs dozens of tiny actions whose fixed
    per-action overhead dominates; overlapping them cuts the harness
    wall time ~3x with identical results. Builds happen BEFORE the pool
    (plan construction / temp-view registration stay single-threaded);
    the DuckDB side stays serial on the caller."""
    from concurrent.futures import ThreadPoolExecutor

    def one(item):
        label, df = item
        return label, df.toPandas()

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return dict(pool.map(one, named_dfs))


def _compare(got: pd.DataFrame, want: pd.DataFrame, label: str) -> None:
    assert list(sorted(got.columns)) == list(sorted(want.columns)), label
    assert len(got) == len(want), f"{label}: {len(got)} vs {len(want)} rows"
    if not len(got):
        return
    cols = sorted(got.columns)
    # Align rows by sorting on non-float (key) columns only: sub-ulp
    # cross-engine float drift can reorder rows when a float column leads
    # the sort and the key columns tie, comparing mismatched rows. Floats
    # participate in the sort only after rounding to the isclose tolerance.
    def _sort_frame(df: pd.DataFrame) -> pd.DataFrame:
        keyed = df[cols].copy()
        for c in cols:
            if np.issubdtype(keyed[c].to_numpy().dtype, np.floating):
                keyed[c] = keyed[c].round(6)
        order = keyed.sort_values(by=cols).index
        return df[cols].loc[order].reset_index(drop=True)

    gs = _sort_frame(got)
    ws = _sort_frame(want)
    for c in cols:
        g, w = gs[c].to_numpy(), ws[c].to_numpy()
        if np.issubdtype(np.asarray(g).dtype, np.floating):
            ok = np.isclose(g.astype(float), w.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = np.asarray(g == w)
        assert ok.all(), f"{label}.{c}: {gs[~ok][c].tolist()[:3]} vs {ws[~ok][c].tolist()[:3]}"


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_corpus())
def test_templates_agree_on_random_corpora(spark, docs):
    sdf = spark.createDataFrame(docs)
    sdf.createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.register("documents", docs)
    got_all = _collect_parallel(
        [(b.__name__, spark.sql(b(L._Spark))) for b in _TEMPLATES]
    )
    for build in _TEMPLATES:
        label = build.__name__
        got = got_all[label]
        want = con.execute(build(L._Duck)).fetchdf()
        try:
            _compare(got, want, label)
        except AssertionError:
            docs.to_json("/tmp/falsify_docs.json", orient="records")
            got.to_json(f"/tmp/falsify_{label}_spark.json", orient="records", double_precision=15)
            want.to_json(f"/tmp/falsify_{label}_duck.json", orient="records", double_precision=15)
            raise
    # anti-vacuousness: every doc with at least one word must get a
    # fertility row (the merge-exhaustion bug annihilated the vocabulary
    # in BOTH engines, so the parity compare alone passed on 0 == 0 rows)
    n_real = int((docs.text.fillna("").str.strip() != "").sum())
    got = spark.sql(L._sql_bpe_apply(L._Spark)).toPandas()
    assert len(got) == n_real, f"bpe_apply dropped docs: {len(got)} vs {n_real}"


# embedding-table templates: the risky edges are all-zero vectors,
# constant vectors (zero variance), exact duplicates, and tiny tables
# (fewer rows than the seed/codebook cutoffs assume)
_component = st.sampled_from([0.0, 0.25, -0.5, 1.0, -1.0])


@st.composite
def _embeddings(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    vecs = []
    for i in range(n):
        kind = draw(st.sampled_from(["rand", "zero", "const"]))
        if kind == "zero":
            vecs.append([0.0] * 64)
        elif kind == "const":
            vecs.append([0.25] * 64)
        else:
            vecs.append([draw(_component) for _ in range(64)])
    if draw(st.booleans()) and n >= 2:
        vecs[-1] = list(vecs[0])  # exact duplicate
    return pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": vecs,
            "label": [draw(st.integers(min_value=0, max_value=3)) for _ in range(n)],
        }
    )


_EMB_TEMPLATES = [
    L._sql_embedding_dim_stats,
    L._sql_embedding_outliers,
    L._sql_embedding_normalize,
    L._sql_embedding_quantize,
    L._sql_embedding_corr,
    L._sql_kmeans,
    L._sql_kmeans_inertia,
    L._sql_ann_brute,
    L._sql_ann_pq,
    L._sql_ann_ivfpq,
    L._sql_knn_label_consistency,
    L._sql_hard_negatives,
    L._sql_embed_threshold_sweep,
    L._sql_recall_vs_probes,
    L._nnd_oracle,
    L._sql_rp_recall,
    L._sql_centroid_drift,
    L._sql_isotropy,
    L._sql_int8_recall,
    # round-5: balanced downsampling (n < #labels) and the top1/top2
    # margin (duplicate vectors -> zero margin, zero-vector guard)
    L._sql_label_balance,
    L._sql_margin_audit,
    L._sql_emb_exact_dup,
    L._sql_filtered_search,
    # round-9: graded nDCG over the LSH + brute legs (zero-idcg guard;
    # decimal DCG sums) and the centroid silhouette (a=b=0 duplicate
    # guard; recomputed final centroids)
    L._sql_ndcg_eval,
    L._sql_silhouette,
    # L._gs_oracle is NOT fuzzed here: its template spelling (no
    # checkpoints — that's the runner's job) re-expands the NN-Descent
    # chain 2x per hop inside Catalyst, costing ~7 min of pure plan time
    # per harness run on 8-row tables; the registered runner is
    # checkpointed and driver-verified instead.
]


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(embs=_embeddings())
def test_embedding_templates_agree_on_random_tables(spark, embs):
    from pyspark.sql.types import ArrayType, FloatType, IntegerType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    spark.createDataFrame(embs, schema=schema).createOrReplaceTempView("embeddings")
    con = duckdb.connect()
    con.register("embeddings_pd", embs)
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        "SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, label FROM embeddings_pd"
    )
    got_all = _collect_parallel(
        [(b.__name__, spark.sql(b(L._Spark))) for b in _EMB_TEMPLATES]
    )
    for build in _EMB_TEMPLATES:
        label = build.__name__
        got = got_all[label]
        want = con.execute(build(L._Duck)).fetchdf()
        _compare(got, want, label)


# events-table queries: generated at QUERY level (the events family lives
# in plans/relational.py as paired spellings, not shared templates) — the
# risky edges are same-timestamp events per user (window/LAG tie-breaks),
# single-event users, and sparse hours
import os
import shutil
import tempfile

from datafusion_remote_table_spark import plans

plans.load_all()

_EVENT_QUERIES = [
    "events_sessionize",
    "events_tumbling_window",
    "events_funnel",
    "retention_cohorts",
    "events_gap_fill_locf",
    "events_markov_transitions",
    "events_hourly_anomaly",
    "events_top_paths",
    "json_extract_events",
    "window_running_sum",
    "asof_join_events_orders",
    "zorder_layout_audit",
    "events_scd2_history",
    "events_concurrency_hourly",
    "events_churn_features",
    "events_ab_test",
    "events_survival_curve",
    "events_late_arrival_audit",
    # round-4 continuations: monitoring family (same-timestamp ties, NULL
    # values, single-hour/day series are exactly their risky edges)
    "events_bot_score",
    "feature_drift_psi",
    "events_hourly_acf",
    "events_cusum_changepoint",
    "events_forecast_ewma",
    "interval_attribution_join",
    "events_mad_anomaly",
    "events_sessionize_capped",
    "events_funnel_latency",
    "column_histogram_report",
    "events_decayed_popularity",
    "hilbert_layout_audit",
    "events_anova_value",
    "events_ks_test",
    "events_user_predictability",
    "events_weekday_profile",
    # round-5: whale-curve rank lookups (ties, tiny n) and winsorized
    # robust stats (single-value censuses, all-identical values)
    "events_power_users_pareto",
    "events_value_winsorized_stats",
    "events_ab_srm_check",
    "events_spectral_peaks",
    "events_markov_stationary",
    "events_linear_attribution",
    "events_markov_heldout_accuracy",
    "events_engagement_fatigue",
    "events_lifetime_gamma_moments",
    # round-7: non-contiguous subsequences (same-timestamp first
    # occurrences hit the lexicographic tie-break; single-user tables)
    "events_prefixspan_subsequences",
    # round-8: chain entropy rate (single-state tables hit the ln(k)
    # guard; users with one event leave the transition census empty)
    "events_entropy_rate",
]

_TYPES = ["view", "click", "purchase", "signup", "error"]


@st.composite
def _events_table(draw):
    n = draw(st.integers(min_value=8, max_value=30))
    n_users = draw(st.integers(min_value=1, max_value=4))
    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                base + pd.Timedelta(minutes=draw(st.integers(min_value=0, max_value=600))),
                draw(st.integers(min_value=0, max_value=n_users - 1)),
                draw(st.sampled_from(_TYPES)),
                draw(st.sampled_from([0.0, 1.5, 10.0, 185.22, None])),
                draw(st.sampled_from(['{"k": 1}', '{"k": 87}', '{}', None])),
            )
        )
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=_events_table())
def test_event_queries_agree_on_random_tables(spark, events):
    from .conftest import SF_DIR

    tmp = tempfile.mkdtemp(prefix="tpl_prop_events_")
    try:
        for t in os.listdir(SF_DIR):
            if t.endswith(".parquet"):
                os.symlink(os.path.join(SF_DIR, t), os.path.join(tmp, t))
        os.unlink(os.path.join(tmp, "events.parquet"))
        events.to_parquet(os.path.join(tmp, "events.parquet"), index=False)
        con = duckdb.connect()
        for f in os.listdir(tmp):
            t = f.removesuffix(".parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{f}')"
            )
        got_all = _collect_parallel(
            [(name, plans.QUERIES[name](spark, tmp)) for name in _EVENT_QUERIES]
        )
        for name in _EVENT_QUERIES:
            want = con.execute(plans.ORACLE[name]).fetchdf()
            _compare(got_all[name], want, name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# orders-table queries: the lakehouse/planning family — risky edges are
# zero prices (zero cents), tiny tables (NTILE with fewer rows than
# tiles, single-bin histograms), EMPTY md5 samples (range boundaries),
# and snapshots where one merge/CDC side is empty
_ORDER_QUERIES = [
    "orders_merge_upsert",
    "orders_cdc_changelog",
    "customer_rfm_segments",
    "quantile_sketch_orders",
    "range_partition_plan",
    "orders_seasonality",
    # round-4 continuations: DQ/planning audits (all-zero prices, single
    # months, empty delta/base IVM sides, one-file zone maps)
    "orders_benford_audit",
    "orders_dq_rules_audit",
    "cardinality_qerror_audit",
    "orders_theilsen_trend",
    "ivm_incremental_agg",
    "agg_max_by",
    "customer_spend_gini",
    "bloom_semijoin_prune",
    "orders_duplicate_payment_audit",
    "orders_backlog_aging",
    "file_skipping_stats",
    "pii_subject_access_report",
    "referential_integrity_audit",
    "window_range_trailing",
    "agg_grouping_sets",
    # round-5: time travel over a versioned history (empty version legs,
    # all-future cutoffs) and the keyspace gap census (tiny/sparse keys)
    "orders_snapshot_asof",
    "orders_keyspace_gap_audit",
    "orders_cohort_ltv",
    "customer_tier_migration",
    # round-6 continuation: the new orders-family operators (their
    # degenerate-denominator guards — single month, constant revenue,
    # all-zero prices — exist because this suite keeps finding the
    # ANSI double-division class)
    "orders_kendall_tau",
    "orders_seasonal_naive_mase",
    "orders_expected_shortfall",
    "aqp_sample_error_audit",
    "ivm_join_delta",
    # round-7: l-diversity (single-class tables, all-same-priority
    # classes drive entropy to exactly 0, customers with no orders)
    "privacy_l_diversity_audit",
]

_STATUSES = ["O", "F", "P"]
_PRIOS = ["1-URGENT", "3-MEDIUM", "5-LOW"]


@st.composite
def _orders_table(draw):
    n = draw(st.integers(min_value=3, max_value=25))
    keys = draw(
        st.lists(st.integers(min_value=1, max_value=400), min_size=n, max_size=n, unique=True)
    )
    base = pd.Timestamp("1995-01-01")
    rows = []
    for k in keys:
        rows.append(
            (
                k,
                draw(st.integers(min_value=1, max_value=5)),
                draw(st.sampled_from(_STATUSES)),
                draw(st.sampled_from([0.0, 0.01, 0.05, 999.99, 185.22, 123456.78])),
                base + pd.Timedelta(days=draw(st.integers(min_value=0, max_value=900))),
                draw(st.sampled_from(_PRIOS)),
            )
        )
    df = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    return df


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(orders=_orders_table())
def test_order_queries_agree_on_random_tables(spark, orders):
    from .conftest import SF_DIR

    tmp = tempfile.mkdtemp(prefix="tpl_prop_orders_")
    try:
        for t in os.listdir(SF_DIR):
            if t.endswith(".parquet"):
                os.symlink(os.path.join(SF_DIR, t), os.path.join(tmp, t))
        os.unlink(os.path.join(tmp, "orders.parquet"))
        orders.to_parquet(os.path.join(tmp, "orders.parquet"), index=False)
        con = duckdb.connect()
        for f in os.listdir(tmp):
            t = f.removesuffix(".parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{f}')"
            )
        got_all = _collect_parallel(
            [(name, plans.QUERIES[name](spark, tmp)) for name in _ORDER_QUERIES]
        )
        for name in _ORDER_QUERIES:
            want = con.execute(plans.ORACLE[name]).fetchdf()
            _compare(got_all[name], want, name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_corpus())
def test_prefix_filter_join_is_exact(docs):
    """AllPairs prefix filtering guarantees ZERO false negatives at the
    threshold: every pair with shingle jaccard >= 0.8 shares at least
    one indexed prefix token (and the length filter can't drop it).
    Verify against the brute-force all-pairs join on random corpora —
    an algorithmic property the fixed-corpus oracle compare can't pin
    (DuckDB-only: the property is about the candidate math, which the
    parity tests already prove identical across engines)."""
    con = duckdb.connect()
    con.register("documents", docs)
    E = L._Duck
    got = con.execute(
        "WITH sh AS MATERIALIZED (" + L._minhash_shingles(E) + "),"
        + L._prefix_filter_prefix(E, "sh") + ","
        + L._prefix_filter_tail(E, "pfx", "sh")
    ).fetchdf()
    brute = con.execute(
        "WITH sh AS MATERIALIZED (" + L._minhash_shingles(E) + """)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
          AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / (len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles))) >= 0.8e0
        """
    ).fetchdf()
    got_pairs = set(zip(got.doc_a.tolist(), got.doc_b.tolist()))
    brute_pairs = set(zip(brute.doc_a.tolist(), brute.doc_b.tolist()))
    assert got_pairs == brute_pairs, (
        f"missed={sorted(brute_pairs - got_pairs)} "
        f"extra={sorted(got_pairs - brute_pairs)}"
    )


# embeddings-table QUERIES (runner level — the MMR runner's greedy loop
# collects one row per round and checkpoints its pool, so the template
# chain can't run Spark-side): risky edges are zero vectors (guarded
# cosine), constant vectors, exact duplicates (mmr tie-breaks), and
# corpora smaller than the selection count k (pool exhaustion).
_EMB_QUERIES = ["sample_mmr_diverse_topk"]


# documents-table QUERIES (runner level — the CC label propagation runs
# as a Python fixpoint loop Spark-side, so the chain can't be expressed
# as one template): risky edges are corpora with no near-dup pairs at
# all (empty members frame; every doc weight 1) and single-cluster
# corpora (one component absorbing everything).
_DOC_RUNNER_QUERIES = ["sample_dup_aware_weights"]


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_corpus())
def test_doc_runner_queries_agree_on_random_tables(spark, docs):
    from .conftest import SF_DIR

    tmp = tempfile.mkdtemp(prefix="tpl_prop_docr_")
    try:
        for t in os.listdir(SF_DIR):
            if t.endswith(".parquet"):
                os.symlink(os.path.join(SF_DIR, t), os.path.join(tmp, t))
        os.unlink(os.path.join(tmp, "documents.parquet"))
        # pin the text dtype: an all-None draw otherwise round-trips
        # through parquet as a typeless/int column and every
        # lower(text) call fails to bind in DuckDB (harness artifact,
        # not a query property — found by the seed sweep)
        docs.astype({"text": "string", "lang": "string", "source": "string"}).to_parquet(
            os.path.join(tmp, "documents.parquet"), index=False
        )
        con = duckdb.connect()
        for f in os.listdir(tmp):
            t = f.removesuffix(".parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{f}')"
            )
        for name in _DOC_RUNNER_QUERIES:
            got = plans.QUERIES[name](spark, tmp).toPandas()
            want = con.execute(plans.ORACLE[name]).fetchdf()
            _compare(got, want, name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(embs=_embeddings())
def test_embedding_queries_agree_on_random_tables(spark, embs):
    from .conftest import SF_DIR

    tmp = tempfile.mkdtemp(prefix="tpl_prop_emb_")
    try:
        for t in os.listdir(SF_DIR):
            if t.endswith(".parquet"):
                os.symlink(os.path.join(SF_DIR, t), os.path.join(tmp, t))
        os.unlink(os.path.join(tmp, "embeddings.parquet"))
        embs.to_parquet(os.path.join(tmp, "embeddings.parquet"), index=False)
        con = duckdb.connect()
        for f in os.listdir(tmp):
            t = f.removesuffix(".parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{f}')"
            )
        for name in _EMB_QUERIES:
            got = plans.QUERIES[name](spark, tmp).toPandas()
            want = con.execute(plans.ORACLE[name]).fetchdf()
            _compare(got, want, name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# lineitem-table queries: the basket family was REDESIGNED in round 7
# (relative support, checkpointed prune, keyset-filtered support) — its
# risky edges are single-item orders (no pairs at all), duplicate
# (orderkey, partkey) lines (the census dedups, the support side must
# too), identical baskets (every pair frequent), and the regression
# families' degenerate moments (constant price, single return flag).
_LINEITEM_QUERIES = [
    "basket_triples_apriori",
    # round-8: empirical-quantile stocking (single-day brands, all-equal
    # demand, brands with no lineitem rows)
    "orders_newsvendor_plan",
    "basket_part_pairs",
    "lineitem_ols2",
    "lineitem_corr_matrix",
    "lineitem_price_index",
    "lineitem_reorder_point",
    "lineitem_temporal_dq_audit",
]

_FLAGS = ["A", "N", "R"]


@st.composite
def _lineitem_table(draw):
    n = draw(st.integers(min_value=4, max_value=30))
    base = pd.Timestamp("1995-02-01")
    rows = []
    for i in range(n):
        ok = draw(st.integers(min_value=1, max_value=6))
        pk = draw(st.integers(min_value=1, max_value=8))
        rows.append(
            (
                ok,
                pk,
                draw(st.integers(min_value=1, max_value=4)),
                i + 1,
                draw(st.sampled_from([1.0, 5.0, 50.0])),
                draw(st.sampled_from([0.0, 0.01, 901.0, 1234.56])),
                draw(st.sampled_from([0.0, 0.05, 0.1])),
                draw(st.sampled_from([0.0, 0.08])),
                draw(st.sampled_from(_FLAGS)),
                draw(st.sampled_from(["O", "F"])),
                base + pd.Timedelta(days=draw(st.integers(min_value=0, max_value=400))),
            )
        )
    df = pd.DataFrame(
        rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    df["l_shipdate"] = df["l_shipdate"].astype("datetime64[us]")
    return df


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(lineitem=_lineitem_table())
def test_lineitem_queries_agree_on_random_tables(spark, lineitem):
    from .conftest import SF_DIR

    tmp = tempfile.mkdtemp(prefix="tpl_prop_li_")
    try:
        for t in os.listdir(SF_DIR):
            if t.endswith(".parquet"):
                os.symlink(os.path.join(SF_DIR, t), os.path.join(tmp, t))
        os.unlink(os.path.join(tmp, "lineitem.parquet"))
        lineitem.to_parquet(os.path.join(tmp, "lineitem.parquet"), index=False)
        con = duckdb.connect()
        for f in os.listdir(tmp):
            t = f.removesuffix(".parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{f}')"
            )
        for name in _LINEITEM_QUERIES:
            got = plans.QUERIES[name](spark, tmp).toPandas()
            want = con.execute(plans.ORACLE[name]).fetchdf()
            _compare(got, want, name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# part-table queries: the part-primary analytics (dispersion, HHI
# concentration, brand mix, skylines) — risky edges are single-part
# tables, zero/identical retail prices (zero variance, degenerate
# skylines), one brand owning everything (HHI exactly 1), and part keys
# with no lineitem rows (empty join legs).
_PART_QUERIES = [
    "part_price_dispersion",
    "supplier_herfindahl",
    "part_single_source_risk",
    "brand_price_volume_mix",
    "skyline_parts",
    "case_expr_agg",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "discount_elasticity_ols",
]

_BRANDS = ["Brand#11", "Brand#23", "Brand#55"]
_PTYPES = ["PROMO BRUSHED", "STANDARD POLISHED", "ECONOMY ANODIZED"]


@st.composite
def _part_table(draw):
    n = draw(st.integers(min_value=1, max_value=20))
    keys = draw(
        st.lists(st.integers(min_value=1, max_value=200), min_size=n, max_size=n, unique=True)
    )
    rows = []
    for k in keys:
        rows.append(
            (
                k,
                f"part {k}",
                draw(st.sampled_from(_BRANDS)),
                draw(st.sampled_from(_PTYPES)),
                draw(st.integers(min_value=1, max_value=50)),
                draw(st.sampled_from([0.0, 0.01, 901.0, 901.0, 1234.56])),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    )


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(part=_part_table())
def test_part_queries_agree_on_random_tables(spark, part):
    from .conftest import SF_DIR

    tmp = tempfile.mkdtemp(prefix="tpl_prop_part_")
    try:
        for t in os.listdir(SF_DIR):
            if t.endswith(".parquet"):
                os.symlink(os.path.join(SF_DIR, t), os.path.join(tmp, t))
        os.unlink(os.path.join(tmp, "part.parquet"))
        part.to_parquet(os.path.join(tmp, "part.parquet"), index=False)
        con = duckdb.connect()
        for f in os.listdir(tmp):
            t = f.removesuffix(".parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{f}')"
            )
        for name in _PART_QUERIES:
            got = plans.QUERIES[name](spark, tmp).toPandas()
            want = con.execute(plans.ORACLE[name]).fetchdf()
            _compare(got, want, name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# customer-table queries: governance + distribution analytics — risky
# edges are negative/zero balances (credit exposure, the NULLIF band in
# null_handling), single-class QI tables (k-anonymity k=n), customers
# with no orders (q13's zero bucket, q22's anti-join), and duplicate
# balances (band ties).
_CUSTOMER_QUERIES = [
    "kanonymity_audit",
    "customer_credit_exposure",
    "q13_customer_distribution",
    "q22_sales_opportunity",
    "null_handling",
    "privacy_l_diversity_audit",
]

_SEGMENTS = ["BUILDING", "MACHINERY", "AUTOMOBILE"]


@st.composite
def _customer_table(draw):
    n = draw(st.integers(min_value=1, max_value=20))
    keys = draw(
        st.lists(st.integers(min_value=1, max_value=60), min_size=n, max_size=n, unique=True)
    )
    rows = []
    for k in keys:
        rows.append(
            (
                k,
                f"cust {k}",
                draw(st.integers(min_value=0, max_value=4)),
                draw(st.sampled_from([-999.99, 0.0, 0.0, 123.45, 9999.99])),
                draw(st.sampled_from(_SEGMENTS)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(customer=_customer_table())
def test_customer_queries_agree_on_random_tables(spark, customer):
    from .conftest import SF_DIR

    tmp = tempfile.mkdtemp(prefix="tpl_prop_cust_")
    try:
        for t in os.listdir(SF_DIR):
            if t.endswith(".parquet"):
                os.symlink(os.path.join(SF_DIR, t), os.path.join(tmp, t))
        os.unlink(os.path.join(tmp, "customer.parquet"))
        customer.to_parquet(os.path.join(tmp, "customer.parquet"), index=False)
        con = duckdb.connect()
        for f in os.listdir(tmp):
            t = f.removesuffix(".parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{f}')"
            )
        for name in _CUSTOMER_QUERIES:
            got = plans.QUERIES[name](spark, tmp).toPandas()
            want = con.execute(plans.ORACLE[name]).fetchdf()
            _compare(got, want, name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_decimal_product_keeps_scale_12(spark):
    """Regression for the round-7 fuzz find: Spark's precision-loss rule
    silently collapsed SUM((p - y) * (p - y)) with p DECIMAL(18,6) and
    y BIGINT to DecimalType(38,6) — each squared term lost 6 digits
    (0.123457^2 -> 0.015242 vs the exact 0.015241630849), which flipped
    quality_score_calibration's 6dp brier at a half boundary vs DuckDB.
    The narrow spelling CAST(p - y AS DECIMAL(12,6)) keeps the square
    exact at scale 12 in both engines — pin it."""
    q = ("SELECT SUM(CAST(p - y AS DECIMAL(12,6)) * CAST(p - y AS DECIMAL(12,6))) AS s "
         "FROM (SELECT CAST(0.123457 AS DECIMAL(18,6)) AS p, CAST(0 AS BIGINT) AS y) t")
    sdf = spark.sql(q)
    assert sdf.schema[0].dataType.scale == 12, sdf.schema[0].dataType
    import duckdb as _duck

    assert str(sdf.collect()[0][0]) == str(_duck.connect().execute(q).fetchone()[0])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(embs=_embeddings())
def test_semdedup_two_phase_equals_brute_exists(embs):
    """The round-8 two-phase semdedup (group-min first, pairwise only on
    survivors) must produce the IDENTICAL verdict set as the brute
    EXISTS definition: pruned iff some lower-id member of the same
    (IVF cluster x LSH bucket) group has cosine >= t. DuckDB-only: the
    property is about the two-phase set algebra; the cross-engine
    parity of the underlying arithmetic is covered by the oracle
    compare (the inline template is kept out of the Spark fuzz for the
    same plan-cost reason as the NN-Descent chain)."""
    con = duckdb.connect()
    con.register("embeddings", embs)
    E = L._Duck
    got = con.execute(L._sql_semdedup(E)).fetchdf()
    lists = f"({L._sql_ivf_lists(E)})"
    cos = (
        f"{E.dot('a.embedding', 'b.embedding')} / "
        f"(sqrt({E.dot('a.embedding', 'a.embedding')})"
        f" * sqrt({E.dot('b.embedding', 'b.embedding')}))"
    )
    brute = con.execute(f"""
    WITH lb AS ({L._lsh_adaptive(E)}),
    grp AS MATERIALIZED (
      SELECT l.vec_id, l.cent_id, b.band, b.bucket
      FROM {lists} l JOIN lb b ON b.vec_id = l.vec_id
    ),
    pruned AS (
      SELECT DISTINCT gb.vec_id
      FROM grp ga
      JOIN grp gb ON gb.cent_id = ga.cent_id AND gb.band = ga.band
        AND gb.bucket = ga.bucket AND ga.vec_id < gb.vec_id
      JOIN embeddings a ON a.vec_id = ga.vec_id
      JOIN embeddings b ON b.vec_id = gb.vec_id
      WHERE {cos} >= {L._SEMDEDUP_T}e0
    )
    SELECT l.vec_id, l.cent_id,
           CAST(CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
    FROM {lists} l LEFT JOIN pruned p ON l.vec_id = p.vec_id
    """).fetchdf()
    g = got.sort_values("vec_id").reset_index(drop=True)
    b = brute.sort_values("vec_id").reset_index(drop=True)
    assert g["kept"].tolist() == b["kept"].tolist(), (
        f"two-phase {g['kept'].tolist()} vs brute {b['kept'].tolist()}"
    )


# Round-9: the greedy longest-match unigram segmentation — DuckDB chain
# vs a pure-Python reference. This is the regression net for the DuckDB
# 1.0 list_reduce parallelism bug (the fold spelling silently dropped
# 2 of 31 words at sf0.001 under multi-threaded execution; the unrolled
# join-chain replacement must keep matching the reference at any
# morsel count). Random words up to 16 chars exercise walk depths past
# the fixed corpus's max of 8.
_syll = st.sampled_from(["ab", "ba", "abc", "cab", "a", "b", "c", "dada", "dd"])


@st.composite
def _word_corpus(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    words = [
        "".join(draw(st.lists(_syll, min_size=1, max_size=5)))[:16] for _ in range(n)
    ]
    texts = [" ".join(words[i :: draw(st.integers(1, 3))] or [words[i]]) for i in range(n)]
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["src0"] * n,
            "n_chars": [len(t) for t in texts],
        }
    )


def _py_unigram_segments(texts):
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            if 0 < len(w) <= 16:
                wf[w] += 1
    cand = Counter()
    for w, f in wf.items():
        for p in range(len(w)):
            for ln in range(1, min(4, len(w) - p) + 1):
                cand[w[p : p + ln]] += f
    vocab = {p for p in cand if len(p) == 1}
    vocab |= set(sorted((p for p in cand if len(p) >= 2), key=lambda p: (-cand[p], p))[:60])
    segs = {}
    for w in wf:
        pieces, c = [], 0
        while c < len(w):
            for ln in (4, 3, 2, 1):
                piece = w[c : c + ln]
                if len(piece) == ln and piece in vocab:
                    pieces.append(piece)
                    c += ln
                    break
        segs[w] = sorted(pieces)
    return segs


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_word_corpus())
def test_unigram_walk_matches_reference(docs):
    con = duckdb.connect()
    con.register("documents", docs)
    ctes = ",\n    ".join(L._uni_chain_ctes(L._Duck))
    got = con.execute(f"WITH {ctes} SELECT word, piece FROM segs").fetchdf()
    want = _py_unigram_segments(docs.text.tolist())
    got_map = {w: sorted(g.piece.tolist()) for w, g in got.groupby("word")}
    assert got_map == want, {
        w: (got_map.get(w), want.get(w)) for w in set(got_map) | set(want)
        if got_map.get(w) != want.get(w)
    }


def _py_unigram_prune_segments(texts):
    """Pure-Python reference for the prune + re-walk round
    (tokenize_unigram_prune): round-1 greedy segmentation, usage
    census, below-mean multi-char prune (usage * n_multi >= tot, the
    integer spelling), greedy re-walk on the pruned vocabulary."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            if 0 < len(w) <= 16:
                wf[w] += 1
    cand = Counter()
    for w, f in wf.items():
        for p in range(len(w)):
            for ln in range(1, min(4, len(w) - p) + 1):
                cand[w[p : p + ln]] += f

    def _greedy(w, vocab):
        pieces, c = [], 0
        while c < len(w):
            for ln in (4, 3, 2, 1):
                piece = w[c : c + ln]
                if len(piece) == ln and piece in vocab:
                    pieces.append(piece)
                    c += ln
                    break
        return pieces

    vocab = {p for p in cand if len(p) == 1}
    vocab |= set(sorted((p for p in cand if len(p) >= 2), key=lambda p: (-cand[p], p))[:60])
    usage = Counter()
    for w, f in wf.items():
        for piece in _greedy(w, vocab):
            usage[piece] += f
    multi = {p: u for p, u in usage.items() if len(p) >= 2}
    n_multi, tot = len(multi), sum(multi.values())
    vocab2 = {p for p in vocab if len(p) == 1}
    vocab2 |= {p for p, u in multi.items() if u * n_multi >= tot}
    return {w: sorted(_greedy(w, vocab2)) for w in wf}


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_word_corpus())
def test_unigram_prune_rewalk_matches_reference(docs):
    """Round-10: the pruned-vocabulary re-walk (the r2-prefixed join
    chain) against the Python reference — random words up to 16 chars
    exercise re-walk depths past the fixed corpus's max, including the
    all-single-char segmentations a heavy prune produces."""
    con = duckdb.connect()
    con.register("documents", docs)
    ctes = ",\n    ".join(L._uni_prune_ctes(L._Duck))
    got = con.execute(f"WITH {ctes} SELECT word, piece FROM segs2").fetchdf()
    want = _py_unigram_prune_segments(docs.text.tolist())
    got_map = {w: sorted(g.piece.tolist()) for w, g in got.groupby("word")}
    assert got_map == want, {
        w: (got_map.get(w), want.get(w)) for w in set(got_map) | set(want)
        if got_map.get(w) != want.get(w)
    }


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_word_corpus())
def test_roundtrip_audit_zero_on_random_corpora(docs):
    """Round-10: the lossless-segmentation invariant must hold on
    ARBITRARY corpora for both tokenizers — greedy longest-match always
    covers (every character is in the seed vocab) and BPE merges only
    concatenate; a nonzero mismatch on any random corpus is a trainer
    bug. The detector itself is certified by the corrupted-input test
    in test_operators."""
    con = duckdb.connect()
    con.register("documents", docs)
    df = con.execute(L._sql_roundtrip_audit(L._Duck)).fetchdf()
    assert (df.uni_mismatches == 0).all() and (df.bpe_mismatches == 0).all()
