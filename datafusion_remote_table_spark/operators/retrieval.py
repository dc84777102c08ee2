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
