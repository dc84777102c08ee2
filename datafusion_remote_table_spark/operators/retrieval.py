"""Retrieval operators as a reusable DataFrame API.

The fixed-parameter versions registered in plans/llm_data.py
(`bm25_topk`, `tfidf_top_terms`, `hybrid_search_rrf`) are the
driver-verified instances of these; this module exposes the same
algorithms with tunable parameters for pipeline use (same contract as
operators/corpus.py and operators/dedup.py).

Scale posture (100TB):
- BM25 filters the posting explode to the QUERY TERMS before any
  shuffle (the inverted-index access pattern without an index): only
  matching postings move, df/corpus stats are term-count-sized and
  broadcast, and the final top-k is TakeOrderedAndProject;
- tf-idf aggregates on uniform (doc, term) keys with map-side partials;
  the vocab-sized df relation broadcasts back;
- RRF fusion joins two k-row lists — O(k) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window

from ..session import local_frame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _postings(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("w")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k over `df[text_col]` for `query_terms`."""
    doclen = df.select(
        F.col(id_col), F.size(tokens(F.lower(F.col(text_col)))).cast("long").alias("dl")
    )
    stats = doclen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        _postings(df, text_col, id_col)
        .filter(F.col("w").isin(list(query_terms)))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_counts = tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_counts), "w")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum((idf * tf_norm).cast("decimal(18,9)")).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), id_col)
        .limit(k)
        .select(id_col, F.round(F.col("score").cast("double"), 6).alias("bm25"))
    )


def tfidf_top_terms(
    df: DataFrame,
    n_terms: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top `n_terms` terms per doc by smooth tf-idf."""
    tf = (
        _postings(df, text_col, id_col)
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_counts = tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_counts), "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("w").alias("term"),
            "tf",
            F.round(
                F.col("tf")
                * (F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= n_terms)
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rn",
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (id, rank)."""
    a = ranked_a.select(F.col(id_col).alias("id"), F.col(rank_col).alias("r_a"))
    b = ranked_b.select(F.col(id_col).alias("id"), F.col(rank_col).alias("r_b"))
    fused = a.join(b, "id", "full_outer").select(
        "id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("r_a")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("r_b")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        F.coalesce("r_a", F.lit(0)).cast("long").alias("r_a"),
        F.coalesce("r_b", F.lit(0)).cast("long").alias("r_b"),
    )
    return fused.orderBy(F.col("rrf").desc(), "id").limit(top)


def prf_search(
    df: DataFrame,
    seed_terms: list[str],
    n_feedback: int = 10,
    n_expansion: int = 3,
    min_term_len: int = 4,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (the tunable twin of the
    registered `query_expansion_prf`): BM25 with `seed_terms` retrieves
    `n_feedback` docs, their `n_expansion` top summed-tf-idf terms
    (excluding seeds and terms shorter than `min_term_len`) expand the
    query, and the expanded BM25 returns the top `k` with a seed-round
    flag. Scale: the (doc, term) tf census is built once and persisted
    (five consumers); both cuts are bounded; score addends are
    DECIMAL-quantized (order-independent)."""
    tf = (
        _postings(df, text_col, id_col)
        .filter(F.col("w").isNotNull() & (F.col("w") != ""))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .persist()
    )
    doclen = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    dfc = tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )

    def _score(term_rel: DataFrame | None, in_terms: list[str] | None) -> DataFrame:
        base = tf if in_terms is None else tf.filter(F.col("w").isin(in_terms))
        if term_rel is not None:
            base = base.join(F.broadcast(term_rel), "w")
        return (
            base.join(F.broadcast(dfc), "w")
            .join(doclen, id_col)
            .crossJoin(F.broadcast(stats))
            .groupBy(id_col)
            .agg(F.sum((idf * tf_norm).cast("decimal(18,9)")).alias("score"))
        )

    r1 = _score(None, list(seed_terms)).orderBy(F.col("score").desc(), id_col).limit(n_feedback)
    n_docs_rel = stats.select("n_docs")
    cand = (
        tf.join(F.broadcast(r1.select(id_col)), id_col)
        .filter(~F.col("w").isin(list(seed_terms)) & (F.length("w") >= min_term_len))
        .join(F.broadcast(dfc), "w")
        .crossJoin(F.broadcast(n_docs_rel))
        .groupBy("w")
        .agg(
            F.sum(
                F.round(
                    F.col("tf")
                    * (F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)),
                    6,
                ).cast("decimal(18,6)")
            ).alias("escore")
        )
        .orderBy(F.col("escore").desc(), "w")
        .limit(n_expansion)
    )
    terms2 = cand.select("w").union(
        local_frame(cand.sparkSession, [(t,) for t in seed_terms], "w string")
    )
    r2 = _score(terms2, None)
    return (
        r2.join(r1.select(F.col(id_col), F.lit(1).alias("_seed")), id_col, "left")
        .select(
            id_col,
            F.round(F.col("score").cast("double"), 6).alias("bm25_expanded"),
            F.coalesce(F.col("_seed"), F.lit(0)).cast("int").alias("in_seed_top10"),
        )
        .orderBy(F.col("bm25_expanded").desc(), id_col)
        .limit(k)
    )
