"""Similarity-search operators over embedding columns.

Scale posture: brute force is the per-query-bounded baseline (a
broadcast of the query set against a partitioned scan of candidates —
no shuffle of the big side); LSH bucketing prunes candidates so the
join shuffles only bucket-matched rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query set,
    score candidates map-side, take k via window. Returns
    (query_id, vec_id, cosine, rn)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cos = F.round(cosine_similarity(F.col("q_vec"), F.col(vec_col)), round_digits)
    scored = (
        candidates.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.select("*", F.row_number().over(w).alias("rn")).filter(F.col("rn") <= k)


def lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector. Hyperplane components
    are md5-keyed ±1 (deterministic, seedless): plane p, dim i is -1 when
    the first hex digit of md5('p,i') < 8. Adds a `bucket` column."""
    dim_idx = F.sequence(F.lit(1), F.size(F.col(vec_col)))

    def proj(p):
        return F.aggregate(
            F.zip_with(
                dim_idx,
                F.col(vec_col),
                lambda i, x: F.when(
                    F.conv(
                        F.substring(F.md5(F.concat(p.cast("string"), F.lit(","), i.cast("string"))), 1, 1),
                        16,
                        10,
                    ).cast("int")
                    < 8,
                    -x.cast("double"),
                ).otherwise(x.cast("double")),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )

    bucket = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_planes)),
            lambda p: F.when(proj(p) >= 0, F.pow(F.lit(2.0), p - 1).cast("int")).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return df.select("*", bucket.cast("bigint").alias("bucket"))


def adaptive_lsh_buckets(df, target_bucket: int = 50, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Banded hyperplane LSH whose bucket resolution GROWS with the input
    (the scale path behind dedup_embedding_cosine / semdedup_embedding):
    4 bands x 12 build-time-inlined md5-keyed planes, bucket key = top
    clamp(ceil(log2(n / target_bucket)), 4, 12) signature bits. Returns
    (id_col, band, bucket) — one row per (vector, band); candidates are
    same-(band, bucket) pairs. Per-band candidate volume stays ~n x
    target_bucket at any corpus size, where any fixed resolution goes
    quadratic (measured: 73 s vs 12 s at a 16x scale test)."""
    import hashlib

    from pyspark.sql import SparkSession

    from ..plans.llm_data import _Spark, _lsh_adaptive

    from pyspark.sql import functions as F

    spark = SparkSession.getActiveSession() or df.sparkSession
    # normalize to the template's (vec_id, embedding) names BEFORE the
    # view — the generated SQL references them literally, so a custom
    # id/vector column must be mapped in, not renamed after
    normalized = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    view = f"adap_lsh_{hashlib.md5(repr(df.schema).encode()).hexdigest()[:8]}"
    normalized.createOrReplaceTempView(view)
    sql = _lsh_adaptive(_Spark, src=view, target_bucket=target_bucket)
    return spark.sql(sql).withColumnRenamed("vec_id", id_col)


def kcenter_coreset(
    df,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Greedy k-center (farthest-point-first) coreset selection (tunable
    twin of the registered ``sample_coreset_kcenter``). Returns
    (sel_order, id, dist_to_centers) — the decreasing radius curve.

    Each round collects the ONE chosen center (bounded control plane)
    and inlines its vector as a literal, so the distance-state update is
    a pure map pass with lineage truncated per round; the argmax is a
    TakeOrderedAndProject. The CROSS-JOIN spelling multiplied partitions
    32x per BroadcastNLJ round — see docs/SCALE.md.
    """
    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))

    def lit_vec(vec):
        return "array(" + ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in vec) + ")"

    def sqdist(a, b):
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )

    seed = (
        src.selectExpr("__id", "md5(CAST(__id AS STRING)) AS __h")
        .orderBy("__h", "__id")
        .limit(1)
        .collect()[0][0]
    )
    emb = src.where(F.col("__id") == seed).collect()[0][1]
    d = src.selectExpr(
        "__id", "__vec", f"ROUND({sqdist('__vec', lit_vec(emb))}, 6) AS __dmin"
    ).localCheckpoint(eager=True)
    selected = [(seed, 0.0)]
    for i in range(2, k + 1):
        cid, dist = (
            d.orderBy(F.desc("__dmin"), "__id").limit(1).select("__id", "__dmin").collect()[0]
        )
        selected.append((cid, float(dist)))
        if i < k:
            emb = src.where(F.col("__id") == cid).collect()[0][1]
            d = d.selectExpr(
                "__id", "__vec",
                f"LEAST(__dmin, ROUND({sqdist('__vec', lit_vec(emb))}, 6)) AS __dmin",
            ).localCheckpoint(eager=True)
    rows = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS sel_order, CAST({cid} AS BIGINT) AS {id_col}, "
        f"CAST('{dist!r}' AS DOUBLE) AS dist_to_centers"
        for i, (cid, dist) in enumerate(selected, start=1)
    )
    return spark.sql(rows)
