"""Library-API operators must agree with the driver-verified SQL-template
instances in plans/ (same algorithm, two expressions)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_remote_table_spark import plans
from datafusion_remote_table_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_signatures,
)
from datafusion_remote_table_spark.operators.similarity import brute_force_topk, lsh_buckets

plans.load_all()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).repartition(4)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).repartition(4)


def test_exact_dedup_keeps_all_when_no_dups(docs):
    n = docs.count()
    assert exact_dedup(docs).count() == n  # testdata has no exact dups


def test_minhash_pairs_match_plan_instance(spark, sf_dir, docs):
    api = {
        (r.id_a, r.id_b) for r in minhash_lsh_pairs(docs).collect()
    }
    plan = {
        (r.doc_a, r.doc_b) for r in plans.QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    assert api == plan


def test_simhash_matches_plan_signature_pairs(spark, sf_dir, docs):
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    plan_pairs = plans.QUERIES["dedup_simhash"](spark, sf_dir).collect()
    for r in plan_pairs[:50]:
        a, b = sigs[r.doc_a], sigs[r.doc_b]
        assert bin(a ^ b).count("1") == r.hamming


def test_brute_force_topk_matches_plan(spark, sf_dir, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    api = {
        (r.query_id, r.vec_id, r.rn) for r in brute_force_topk(emb, queries, k=10).collect()
    }
    plan = {
        (r.query_id, r.vec_id, r.rn)
        for r in plans.QUERIES["ann_cosine_topk"](spark, sf_dir).collect()
    }
    assert api == plan


def test_lsh_buckets_deterministic_and_complete(emb):
    b1 = lsh_buckets(emb).select("vec_id", "bucket").collect()
    b2 = lsh_buckets(emb).select("vec_id", "bucket").collect()
    assert sorted(map(tuple, b1)) == sorted(map(tuple, b2))
    buckets = {r.bucket for r in b1}
    assert all(0 <= b < 256 for b in buckets)
    assert len(buckets) > 4  # spreads across the code space


def test_sessionize_matches_plan(spark, sf_dir):
    from datafusion_remote_table_spark.operators.windows import sessionize
    from datafusion_remote_table_spark.session import load_tables

    # load_tables probes the parquet timestamp unit (us vs ns) and converts
    # only when needed — a hand-rolled `ts div 1000` here broke on us files.
    events = load_tables(spark, sf_dir, ("events",))["events"]
    api = (
        sessionize(events)
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    plan = plans.QUERIES["events_sessionize"](spark, sf_dir).select(
        "user_id", "session_id", "n_events"
    )
    got = sorted(tuple(r) for r in api.collect())
    want = sorted(tuple(r) for r in plan.collect())
    assert got == want


def test_salted_join_matches_plain_join(spark, sf_dir):
    import os as _os
    from datafusion_remote_table_spark.operators.skew import salted_join

    orders = spark.read.parquet(_os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(_os.path.join(sf_dir, "customer.parquet")).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(orders, customer, "o_custkey").groupBy("c_mktsegment").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_asof_join_basic(spark):
    from datafusion_remote_table_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (2, 5, "e3")], "k long, ts long, ev string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 990.0)], "k long, ts long, px double"
    )
    out = {
        (r.k, r.ts, r.ev): r.px
        for r in asof_join(left, right, "k", "ts", "ts", ["px"], tie_break="px").collect()
    }
    assert out == {(1, 10, "e1"): 100.0, (1, 20, "e2"): 150.0, (2, 5, "e3"): None}


def test_skyline_empty_input_returns_empty(spark):
    from datafusion_remote_table_spark.operators.skyline import skyline

    df = spark.createDataFrame([], "x double, y double")
    assert skyline(df, ["x", "y"]).collect() == []


def test_skyline_basic(spark):
    from datafusion_remote_table_spark.operators.skyline import skyline

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 2.0), (5.0, 1.0), (3.0, 3.0), (6.0, 6.0)], "x double, y double"
    )
    got = sorted(tuple(r) for r in skyline(df, ["x", "y"]).collect())
    assert got == [(1.0, 5.0), (2.0, 2.0), (5.0, 1.0)]


def test_connected_components_long_chain(spark):
    """A 10-link near-dup chain must collapse to ONE cluster — the case a
    bounded-hop propagation (round-1 implementation) got wrong."""
    from datafusion_remote_table_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(10)]  # 0-1-2-...-10
    other = [(100, 101), (101, 102)]
    pairs = spark.createDataFrame(chain + other, "id_a long, id_b long")
    got = {(r.node, r.component) for r in connected_components(pairs).collect()}
    assert got == {(i, 0) for i in range(11)} | {(i, 100) for i in (100, 101, 102)}


def test_connected_components_matches_duckdb_recursive(spark):
    """Random-ish sparse graph: Spark label propagation == DuckDB
    WITH RECURSIVE closure (the two mechanisms behind dedup_clusters)."""
    import duckdb

    edges = [(i, (i * 7 + 3) % 40) for i in range(0, 40, 3)] + [(50, 51)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    from datafusion_remote_table_spark.operators.dedup import connected_components

    got = sorted((r.node, r.component) for r in connected_components(pairs).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE p (id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", edges)
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
        WITH RECURSIVE edges AS (
          SELECT id_a AS src, id_b AS dst FROM p
          UNION ALL SELECT id_b, id_a FROM p
          UNION ALL SELECT id_a, id_a FROM p
          UNION ALL SELECT id_b, id_b FROM p
        ),
        walk(src, lbl) AS (
          SELECT src, MIN(dst) FROM edges GROUP BY src
          UNION
          SELECT e.src, w.lbl FROM edges e JOIN walk w ON e.dst = w.src
        )
        SELECT src, MIN(lbl) FROM walk GROUP BY src
        """
        ).fetchall()
    )
    assert got == want


def test_minhash_skew_valve_in_registered_template(spark):
    """1200 identical docs share every band key; the registered template's
    bucket-size valve must drop those buckets (emitting zero pairs there)
    instead of generating |bucket|^2 candidates. Both engines agree."""
    import duckdb
    from datafusion_remote_table_spark.plans.llm_data import (
        _Duck,
        _Spark,
        _minhash_bands,
        _minhash_shingles,
        _minhash_sigs,
        _minhash_verify,
        _sql_minhash_oracle,
    )

    docs = [(i, "the same exact text repeated many times over and over again") for i in range(1200)]
    base = " ".join(f"token{k}" for k in range(60))  # long enough that one
    docs += [(2000, base + " spark"), (2001, base + " sparks")]  # edit keeps jaccard >= 0.8
    spark.createDataFrame(docs, "doc_id long, text string").createOrReplaceTempView("documents")
    sh = spark.sql(_minhash_shingles(_Spark))
    sh.createOrReplaceTempView("skew_sh")
    spark.sql(_minhash_bands(_Spark, f"({_minhash_sigs(_Spark, 'skew_sh')})")).createOrReplaceTempView(
        "skew_bands"
    )
    got = sorted(
        tuple(r) for r in spark.sql(_minhash_verify(_Spark, "skew_bands", "skew_sh")).collect()
    )
    # the identical-doc flood is suppressed; the near-dup pair survives
    assert [(a, b) for a, b, _ in got] == [(2000, 2001)]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    want = sorted(tuple(r) for r in con.execute(_sql_minhash_oracle(_Duck)).fetchall())
    assert got == want


# -- corpus-cleaning API (operators/corpus.py) -------------------------------
def test_boilerplate_stats_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.corpus import boilerplate_stats
    from datafusion_remote_table_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    api = boilerplate_stats(docs).orderBy("doc_id").toPandas()
    reg = plans.QUERIES["line_dedup_boilerplate"](spark, sf_dir).orderBy("doc_id").toPandas()
    assert (api["n_segments"].to_numpy() == reg["n_segments"].to_numpy()).all()
    assert (api["n_boilerplate"].to_numpy() == reg["n_boilerplate"].to_numpy()).all()


def test_ngram_decontaminate_flags_known_overlap(spark, sf_dir):
    from datafusion_remote_table_spark.operators.corpus import ngram_decontaminate
    from datafusion_remote_table_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    out = ngram_decontaminate(train, bench).toPandas()
    assert len(out) == train.count()
    reg = plans.QUERIES["decontaminate_ngram_overlap"](spark, sf_dir).toPandas()
    assert out.contaminated.sum() == reg.contaminated.sum()


def test_pack_sequences_never_exceeds_offset_capacity(spark, sf_dir):
    from datafusion_remote_table_spark.operators.corpus import pack_sequences

    chunks = spark.range(200).select(
        F.col("id").alias("chunk"),
        (F.col("id") % 8).alias("shard"),
        F.md5(F.col("id").cast("string")).alias("shuffle_key"),
        (F.col("id") % 50 + 10).alias("n_tokens"),
    )
    out = pack_sequences(chunks, capacity=128).toPandas()
    assert (out.offset_in_seq >= 0).all() and (out.offset_in_seq < 128).all()
    # packing is contiguous per shard: the last sequence starts below the
    # total token count, so max seq_id is bounded by total/capacity
    for _, grp in out.groupby("shard"):
        assert grp.seq_id.max() <= grp.n_tokens.sum() // 128


def test_kmeans_api_matches_plan_instance(spark, sf_dir, emb):
    from datafusion_remote_table_spark.operators.clustering import kmeans_assign

    api = {(r.vec_id, r.cent_id) for r in kmeans_assign(emb).collect()}
    plan = {
        (r.vec_id, r.cluster)
        for r in plans.QUERIES["kmeans_embeddings"](spark, sf_dir).collect()
    }
    assert api == plan


def test_cluster_sample_api_matches_plan_instance(spark, sf_dir, emb):
    from datafusion_remote_table_spark.operators.clustering import cluster_balanced_sample

    api = {(r.vec_id, r.cent_id) for r in cluster_balanced_sample(emb).collect()}
    plan = {
        (r.vec_id, r.cluster)
        for r in plans.QUERIES["cluster_balanced_sample"](spark, sf_dir).collect()
    }
    assert api == plan


def test_skyline_tree_reduce_matches_flat(spark):
    """A many-partition input forced through multiple tree levels
    (fanin=2) must produce the same skyline as a single-partition run."""
    from datafusion_remote_table_spark.operators.skyline import skyline

    rows = [(i, float((i * 7) % 50), float((i * 13) % 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x double, y double").repartition(16)
    tree = sorted(map(tuple, skyline(df, ["x", "y"], fanin=2).collect()))
    flat = sorted(map(tuple, skyline(df.coalesce(1), ["x", "y"]).collect()))
    assert tree == flat and len(tree) > 0


def test_bm25_api_matches_plan_instance(spark, sf_dir, docs):
    from datafusion_remote_table_spark.operators.retrieval import bm25_topk
    from datafusion_remote_table_spark.plans.llm_data import _BM25_TERMS

    api = {(r.doc_id, r.bm25) for r in bm25_topk(docs, list(_BM25_TERMS)).collect()}
    plan = {(r.doc_id, r.bm25) for r in plans.QUERIES["bm25_topk"](spark, sf_dir).collect()}
    assert api == plan


def test_tfidf_api_matches_plan_instance(spark, sf_dir, docs):
    from datafusion_remote_table_spark.operators.retrieval import tfidf_top_terms

    api = {
        (r.doc_id, r.term, r.tf, r.tfidf, r.rn) for r in tfidf_top_terms(docs).collect()
    }
    plan = {
        (r.doc_id, r.term, r.tf, r.tfidf, r.rn)
        for r in plans.QUERIES["tfidf_top_terms"](spark, sf_dir).collect()
    }
    assert api == plan


def test_rrf_fuse_matches_plan_instance(spark, sf_dir):
    from datafusion_remote_table_spark.operators.retrieval import rrf_fuse

    plan = plans.QUERIES["hybrid_search_rrf"](spark, sf_dir)
    want = {(r.doc_id, r.rrf) for r in plan.collect()}
    # rebuild the two legs exactly as the registered query defines them,
    # then fuse through the API
    from pyspark.sql import functions as F
    from datafusion_remote_table_spark.session import load_tables

    load_tables(spark, sf_dir, ("documents", "embeddings"))
    bm = plans.QUERIES["bm25_topk"](spark, sf_dir).select(
        "doc_id", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                F.col("bm25").desc(), "doc_id"
            )
        ).alias("rn"),
    )
    cos = spark.sql("""
      WITH qvec AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
      SELECT e.vec_id AS doc_id,
             ROUND(aggregate(zip_with(e.embedding, q.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
               / (sqrt(aggregate(zip_with(e.embedding, e.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
                  * sqrt(aggregate(zip_with(q.embedding, q.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))), 6) AS cosine
      FROM embeddings e CROSS JOIN qvec q WHERE e.vec_id <> 0
      ORDER BY cosine DESC, e.vec_id LIMIT 20
    """).select(
        "doc_id", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                F.col("cosine").desc(), "doc_id"
            )
        ).alias("rn"),
    )
    got = {(r.id, r.rrf) for r in rrf_fuse(bm, cos).collect()}
    assert got == want


def test_adaptive_lsh_api_matches_plan_buckets(spark, sf_dir, emb):
    """API buckets == the registered dedup_embedding_cosine candidate
    blocking (same template, same adaptive resolution)."""
    from datafusion_remote_table_spark.operators.similarity import adaptive_lsh_buckets
    from datafusion_remote_table_spark.plans.llm_data import _Spark, _lsh_adaptive
    from datafusion_remote_table_spark.session import load_tables

    load_tables(spark, sf_dir, ("embeddings",))
    api = {tuple(r) for r in adaptive_lsh_buckets(emb).collect()}
    plan = {tuple(r) for r in spark.sql(_lsh_adaptive(_Spark)).collect()}
    assert api == plan and len(api) > 0


def test_skyline_fanin_one_terminates(spark):
    from datafusion_remote_table_spark.operators.skyline import skyline

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 2.0), (5.0, 1.0)], "x double, y double"
    ).repartition(3)
    got = sorted(tuple(r) for r in skyline(df, ["x", "y"], fanin=1).collect())
    assert got == [(1.0, 5.0), (2.0, 2.0), (5.0, 1.0)]


def test_adaptive_lsh_custom_column_names(spark, sf_dir, emb):
    from datafusion_remote_table_spark.operators.similarity import adaptive_lsh_buckets

    renamed = emb.withColumnRenamed("vec_id", "doc_id").withColumnRenamed("embedding", "vec")
    got = {tuple(r) for r in adaptive_lsh_buckets(renamed, id_col="doc_id", vec_col="vec").collect()}
    want = {tuple(r) for r in adaptive_lsh_buckets(emb).collect()}
    assert got == want and len(got) > 0


# -- round-3 late APIs: span census, containment, events, PCA ----------------
def test_substring_span_stats_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.corpus import substring_span_stats
    from datafusion_remote_table_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    api = substring_span_stats(docs).orderBy("doc_id").toPandas()
    reg = plans.QUERIES["dedup_substring_spans"](spark, sf_dir).orderBy("doc_id").toPandas()
    assert (api["n_positions"].to_numpy() == reg["n_positions"].to_numpy()).all()
    assert (api["n_dup_positions"].to_numpy() == reg["n_dup_positions"].to_numpy()).all()


def test_containment_pairs_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.dedup import containment_pairs
    from datafusion_remote_table_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    api = sorted(
        (r["id_a"], r["id_b"], r["jaccard"], r["containment"], r["partial_only"])
        for r in containment_pairs(docs).collect()
    )
    reg = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"], r["containment"], r["partial_only"])
        for r in plans.QUERIES["dedup_containment"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) > 0


def test_markov_transitions_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.windows import markov_transitions
    from datafusion_remote_table_spark.session import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"]
    api = sorted(tuple(r) for r in markov_transitions(events).collect())
    reg = sorted(tuple(r) for r in plans.QUERIES["events_markov_transitions"](spark, sf_dir).collect())
    assert api == reg and len(api) > 0


def test_hourly_anomaly_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.windows import hourly_anomaly
    from datafusion_remote_table_spark.session import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"]
    api = sorted(tuple(r) for r in hourly_anomaly(events).collect())
    reg = sorted(tuple(r) for r in plans.QUERIES["events_hourly_anomaly"](spark, sf_dir).collect())
    assert api == reg and len(api) == 20


def test_pca_api_matches_registered_query(spark, sf_dir, emb):
    from datafusion_remote_table_spark.operators.clustering import pca_top_component

    api = sorted(tuple(r) for r in pca_top_component(emb).collect())
    reg = sorted(
        tuple(r) for r in plans.QUERIES["embedding_pca_top_component"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) == 64


def test_bloom_sizing_integer_parity_at_powers_of_two(spark):
    """Spark's float log2 overshoots at exact powers of two (ln x / ln 2)
    while DuckDB's is exact — the original float spelling sized the
    Bloom filter differently across engines whenever the standing-corpus
    count was a power of two. Pin the integer shifted-powers sizing to
    the same m in both engines at the boundary counts."""
    import duckdb

    from datafusion_remote_table_spark.plans.llm_data import _Duck, _Spark

    def msel(E, olddocs):
        return f"""
        SELECT MIN(cand.m) AS m
        FROM (SELECT {E.shl('CAST(1 AS BIGINT)', 'pw.p')} AS m
              FROM (SELECT {E.explode(E.seq(12, 40), 'p')}) pw) cand,
             (SELECT CAST(greatest(COUNT(*), 1) AS BIGINT) AS n FROM {olddocs}) cnt
        WHERE cand.m >= 8 * cnt.n
        """

    con = duckdb.connect()
    for n in [4096, 4097, 2**15, 2**15 + 1, 2**17]:
        spark.range(n).createOrReplaceTempView("bloom_sizing_probe")
        got = spark.sql(msel(_Spark, "bloom_sizing_probe")).collect()[0]["m"]
        want = con.execute(
            msel(_Duck, f"(SELECT * FROM range({n}))")
        ).fetchone()[0]
        expected = 1 << (8 * n - 1).bit_length()  # smallest 2^p >= 8n
        assert got == want == expected, (n, got, want, expected)


def test_pagerank_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.dedup import pagerank
    from datafusion_remote_table_spark.plans.llm_data import (
        _Spark,
        _bigram_stage,
        _containment_cand_prefix,
        _minhash_stage,
    )
    from datafusion_remote_table_spark.session import load_tables

    # the registered query runs centrality on the containment CANDIDATE
    # graph (the verified pair graph is symmetric 2-cliques with uniform
    # PageRank) — feed the API the same graph
    load_tables(spark, sf_dir, ("documents",))
    _sh, _sig, bands = _minhash_stage(spark, sf_dir)
    pairs = spark.sql(
        f"{_containment_cand_prefix(_Spark, bands, bg_src=_bigram_stage(spark, sf_dir))}"
        "\n    SELECT doc_a, doc_b FROM allcand"
    )
    api_df = pagerank(pairs, a_col="doc_a", b_col="doc_b")
    api = [
        (r["node"], r["degree"], r["score_fp"], r["score"])
        for r in api_df.orderBy(F.desc("score_fp"), "node").limit(20).collect()
    ]
    reg = [
        (r["doc_id"], r["degree"], r["pagerank_fp"], r["pagerank"])
        for r in plans.QUERIES["dedup_graph_pagerank"](spark, sf_dir).collect()
    ]
    assert api == reg and len(api) > 0


def test_ngram_novelty_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.corpus import ngram_novelty
    from datafusion_remote_table_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    api = sorted(
        (r["doc_id"], r["n_grams"], r["n_novel"], r["novelty_rate"])
        for r in ngram_novelty(docs).collect()
    )
    reg = sorted(
        (r["doc_id"], r["n_grams"], r["n_novel"], r["novelty_rate"])
        for r in plans.QUERIES["text_ngram_novelty"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) > 0


def test_scd2_history_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.windows import scd2_history
    from datafusion_remote_table_spark.session import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"]
    cols = ("user_id", "state", "valid_from", "valid_to", "n_events", "is_current")
    api = sorted(tuple(r[c] for c in cols) for r in scd2_history(events).collect())
    reg = sorted(
        tuple(r[c] for c in cols)
        for r in plans.QUERIES["events_scd2_history"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) > 0


def test_kcenter_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.similarity import kcenter_coreset
    from datafusion_remote_table_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    cols = ("sel_order", "vec_id", "dist_to_centers")
    api = sorted(tuple(r[c] for c in cols) for r in kcenter_coreset(emb).collect())
    reg = sorted(
        tuple(r[c] for c in cols)
        for r in plans.QUERIES["sample_coreset_kcenter"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) > 0


def test_merge_upsert_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.maintenance import merge_upsert
    from datafusion_remote_table_spark.session import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.lit("P").alias("o_orderstatus"),
        (
            F.expr("(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 105 + 50) DIV 100").cast(
                "double"
            )
            / 100
        ).alias("o_totalprice"),
    )
    cols = ("o_orderkey", "o_orderstatus", "o_totalprice", "merge_op")
    api = sorted(
        tuple(r[c] for c in cols)
        for r in merge_upsert(base, updates, ("o_orderkey",)).collect()
    )
    reg = sorted(
        tuple(r[c] for c in cols)
        for r in plans.QUERIES["orders_merge_upsert"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) > 0


def test_cdc_changelog_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.maintenance import cdc_changelog
    from datafusion_remote_table_spark.session import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    cents = F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select("o_orderkey", cents.alias("cents"))
    new = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.expr("(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 110 + 50) DIV 100"),
        )
        .otherwise(cents)
        .alias("cents"),
    )
    api_df = cdc_changelog(old, new, ("o_orderkey",), ("cents",)).select(
        "o_orderkey", "op", (F.col("cents").cast("double") / 100).alias("price")
    )
    cols = ("o_orderkey", "op", "price")
    api = sorted(tuple(r[c] for c in cols) for r in api_df.collect())
    reg = sorted(
        tuple(r[c] for c in cols)
        for r in plans.QUERIES["orders_cdc_changelog"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) > 0


def test_countmin_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )
    from datafusion_remote_table_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = (
        docs.select(F.explode(F.expr("split(trim(lower(text)), '\\\\s+')")).alias("w"))
        .filter(F.col("w").isNotNull() & (F.col("w") != ""))
    )
    # the registered instance sizes width to the corpus's 31-word
    # vocabulary (w=16) so collisions/overcount actually occur
    sketch = countmin_sketch(toks, "w", width=16)
    top20 = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(20)
    )
    api_df = countmin_estimate(sketch, top20, "w", width=16).join(top20, "w")
    api = sorted(
        (r["w"], r["c"], r["cm_estimate"]) for r in api_df.collect()
    )
    reg = sorted(
        (r["word"], r["true_count"], r["cm_estimate"])
        for r in plans.QUERIES["heavy_hitters_countmin"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) > 0


def test_hll_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.sketches import hll_distinct
    from datafusion_remote_table_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    words = (
        docs.select(
            "source", F.explode(F.expr("split(trim(lower(text)), '\\\\s+')")).alias("w")
        )
        .filter(F.col("w").isNotNull() & (F.col("w") != ""))
    )
    api = sorted(
        (r["source"], r["n_zero_regs"], r["hll_estimate"])
        for r in hll_distinct(words, "w", ("source",)).collect()
    )
    reg = sorted(
        (r["source"], r["n_zero_regs"], r["hll_estimate"])
        for r in plans.QUERIES["approx_distinct_hll"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) > 0


# ---- governance APIs must agree with the registered SQL instances ----


def _pdf_eq(a, b):
    import pandas as pd

    a = a.toPandas().reindex(sorted(a.columns), axis=1).reset_index(drop=True)
    b = b.toPandas().reindex(sorted(b.columns), axis=1).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9, rtol=1e-9)


def test_dq_audit_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.governance import dq_audit

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    api = dq_audit(
        orders,
        {
            "price_positive": "o_totalprice IS NULL OR o_totalprice <= 0",
            "status_domain": "o_orderstatus NOT IN ('O', 'F', 'P')",
            "date_range": "o_orderdate < TIMESTAMP '1992-01-01 00:00:00'"
            " OR o_orderdate > TIMESTAMP '1998-12-31 23:59:59'",
            "custkey_not_null": "o_custkey IS NULL",
        },
        unique_key="o_orderkey",
    ).withColumn(
        "rule_name",
        F.when(F.col("rule_name") == "o_orderkey_unique", "key_unique").otherwise(
            F.col("rule_name")
        ),
    ).orderBy("rule_name")
    reg = plans.QUERIES["orders_dq_rules_audit"](spark, sf_dir)
    _pdf_eq(api, reg)


def test_psi_drift_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.governance import psi_drift

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    lo, hi = events.agg(
        F.min(F.unix_timestamp("ts").cast("bigint")),
        F.max(F.unix_timestamp("ts").cast("bigint")),
    ).collect()[0]
    api = psi_drift(
        events,
        f"CAST(unix_timestamp(ts) AS BIGINT) * 2 <= {lo + hi}",
        numeric_cols=("value",),
        categorical_cols=("event_type",),
    )
    reg = plans.QUERIES["feature_drift_psi"](spark, sf_dir).withColumn(
        "feature", F.when(F.col("feature") == "value", "value").otherwise("event_type")
    )
    _pdf_eq(api, reg)


def test_referential_integrity_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.governance import referential_integrity

    t = {
        n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        for n in ("lineitem", "orders", "customer", "events", "nation")
    }
    api = referential_integrity(
        {
            "lineitem.l_orderkey -> orders": (t["lineitem"], "l_orderkey", t["orders"], "o_orderkey"),
            "orders.o_custkey -> customer": (t["orders"], "o_custkey", t["customer"], "c_custkey"),
            "events.user_id -> customer": (t["events"], "user_id", t["customer"], "c_custkey"),
            "customer.c_nationkey -> nation": (t["customer"], "c_nationkey", t["nation"], "n_nationkey"),
        }
    )
    reg = plans.QUERIES["referential_integrity_audit"](spark, sf_dir)
    _pdf_eq(api, reg)


def test_kanonymity_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.governance import kanonymity

    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).withColumn(
        "acctbal_band", F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
    )
    api = kanonymity(customer, ("c_nationkey", "c_mktsegment", "acctbal_band"))
    reg = plans.QUERIES["kanonymity_audit"](spark, sf_dir)
    _pdf_eq(api, reg)


def test_prf_api_matches_plan_instance(spark, sf_dir, docs):
    from datafusion_remote_table_spark.operators.retrieval import prf_search
    from datafusion_remote_table_spark.plans.llm_data import _BM25_TERMS

    api = {
        (r.doc_id, r.bm25_expanded, r.in_seed_top10)
        for r in prf_search(docs, list(_BM25_TERMS)).collect()
    }
    plan = {
        (r.doc_id, r.bm25_expanded, r.in_seed_top10)
        for r in plans.QUERIES["query_expansion_prf"](spark, sf_dir).collect()
    }
    assert api == plan


def test_global_rank_api_matches_window_spelling(spark):
    from pyspark.sql import Window as W
    from datafusion_remote_table_spark.operators.windows import global_rank

    rows = [(i, float((i * 37) % 101)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(8)
    api = global_rank(df, "v", "id", descending=True, n_buckets=8)
    got = {(r.id, r["rank"]) for r in api.collect()}
    w = W.orderBy(F.desc("v"), F.asc("id"))
    want = {
        (r.id, r.rk)
        for r in df.withColumn("rk", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want
    # every window in the API plan is bucket-partitioned
    plan = api._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window [" in line:
            assert "_bkt" in line


def test_prefix_filter_pairs_matches_registered_query(spark, sf_dir):
    # the API orders prefixes by (df, raw gram string) while the plan
    # orders by (df, 60-bit gram hash) — different tie-breaks, SAME
    # result set: prefix filtering is exact for ANY global token order,
    # which this equality demonstrates on real data
    from datafusion_remote_table_spark.operators.dedup import prefix_filter_pairs
    from datafusion_remote_table_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    api = sorted(
        (r["id_a"], r["id_b"], r["size_a"], r["size_b"], r["jaccard"])
        for r in prefix_filter_pairs(docs).collect()
    )
    reg = sorted(
        (r["doc_a"], r["doc_b"], r["size_a"], r["size_b"], r["jaccard"])
        for r in plans.QUERIES["dedup_prefix_filter_join"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) > 0


def test_sorted_neighborhood_pairs_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.dedup import sorted_neighborhood_pairs
    from datafusion_remote_table_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    api = sorted(
        (r["id_a"], r["id_b"], r["rank_gap"], r["jaccard"], r["matched"])
        for r in sorted_neighborhood_pairs(docs).collect()
    )
    reg = sorted(
        (r["doc_a"], r["doc_b"], r["rank_gap"], r["jaccard"], r["matched"])
        for r in plans.QUERIES["dedup_sorted_neighborhood"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) > 0


def test_substring_clip_merges_overlapping_runs(spark):
    """Round-10 (VERDICT r9 item 2): the clip arithmetic must be a
    union-of-intervals — two duplicated runs whose WORD spans overlap
    (gram gap < gram width) merge into one clip interval and their
    shared words are counted once, never twice; disjoint runs stay
    separate clips. Hand-computed truth on a constructed corpus."""
    from datafusion_remote_table_spark.plans import llm_data as L

    rows = [
        # X: two dup runs overlapping at word 5 -> ONE merged clip [1,9]
        (1, "p q r s t u v w x y"),
        (2, "p q r s t"),   # shares words 1-5 with X (run at gram pos 1-2)
        (3, "t u v w x"),   # shares words 5-9 with X (run at gram pos 5-6)
        # D: two DISJOINT dup runs -> two clips, one retained word (the M)
        (4, "a b c d e f M g h i j k l"),
        (5, "a b c d e f"),
        (6, "g h i j k l"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "clip_docs_t"
    )
    pos = f"({L._span_pos_sql(L._Spark, src='clip_docs_t')})"
    out = {
        r.doc_id: r
        for r in spark.sql(
            L._span_clip_select(L._Spark, pos, src="clip_docs_t")
        ).collect()
    }
    x = out[1]
    assert (x.n_clips, x.clipped_words, x.retained_words) == (1, 9, 1), (
        "overlapping runs must merge to one 9-word clip (naive sum = 10)"
    )
    assert x.longest_clip_words == 9 and abs(x.retained_fraction - 0.1) < 1e-9
    d = out[4]
    assert (d.n_clips, d.clipped_words, d.retained_words) == (2, 12, 1)
    assert d.longest_clip_words == 6
    # the wholly-duplicated phrase docs clip to nothing retained
    assert out[2].retained_words == 0 and out[3].retained_words == 0


def test_roundtrip_audit_detects_corruption(spark):
    """Round-10 (VERDICT r9 item 5): the roundtrip audit's zero mismatch
    columns are a clean-data true negative — this test certifies the
    DETECTOR by feeding corrupted segmentations (a dropped unigram
    piece, a duplicated BPE symbol) and a pathological word containing
    a literal '</w>' (the anchored-strip edge) through the same tail."""
    from datafusion_remote_table_spark.plans import llm_data as L

    spark.createDataFrame(
        [(1, "hello world world x</w>", "en"), (2, "hello", "de")],
        "doc_id long, text string, lang string",
    ).createOrReplaceTempView("rt_docs_t")
    segs = [
        ("hello", "he", 1), ("hello", "ll", 3), ("hello", "o", 5),
        ("world", "wo", 1), ("world", "ld", 4),  # missing 'r' -> 'wold'
        ("x</w>", "x", 1), ("x</w>", "<", 2), ("x</w>", "/", 3),
        ("x</w>", "w", 4), ("x</w>", ">", 5),
    ]
    spark.createDataFrame(
        segs, "word string, piece string, pos int"
    ).createOrReplaceTempView("rt_segs_t")
    vocab = [
        ("hello", "h e l l o </w>"),
        ("world", "w o r l d d </w>"),  # duplicated 'd' -> 'worldd'
        ("x</w>", "x < / w > </w>"),  # anchored strip keeps the literal marker
    ]
    spark.createDataFrame(vocab, "word string, s string").createOrReplaceTempView(
        "rt_vocab_t"
    )
    out = {
        r.lang: r
        for r in spark.sql(
            L._roundtrip_select(L._Spark, "rt_docs_t", "rt_segs_t", "rt_vocab_t")
        ).collect()
    }
    en = out["en"]
    assert (en.n_words, en.uni_mismatches, en.bpe_mismatches) == (4, 2, 2)
    de = out["de"]
    assert (de.n_words, de.uni_mismatches, de.bpe_mismatches) == (1, 0, 0)


def test_substring_clip_api_matches_registered_query(spark, sf_dir):
    from datafusion_remote_table_spark.operators.corpus import substring_clip
    from datafusion_remote_table_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    cols = [
        "doc_id", "n_words", "n_clips", "clipped_words",
        "longest_clip_words", "retained_words", "retained_fraction",
    ]
    api = sorted(tuple(r[c] for c in cols) for r in substring_clip(docs).collect())
    reg = sorted(
        tuple(r[c] for c in cols)
        for r in plans.QUERIES["dedup_substring_clip"](spark, sf_dir).collect()
    )
    assert api == reg and len(api) > 0
