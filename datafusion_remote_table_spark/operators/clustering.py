"""Embedding clustering as a reusable DataFrame API.

The fixed-parameter `kmeans_embeddings` / `cluster_balanced_sample`
queries in plans/llm_data.py are the driver-verified instances of these;
this module exposes the same deterministic Lloyd's algorithm with
tunable k / iteration count for pipeline use.

Scale posture (100TB):
- centroids are k tiny rows, broadcast into every assignment join — the
  data stream is never shuffled for assignment;
- the centroid update explodes (row x dim) and aggregates on
  (cluster, dim): k*dim uniform keys with map-side partial sums;
- means go through floor-quantized fixed-point BIGINT sums, so results
  are order-independent and reproducible run-to-run (float SUM would
  drift with partition order — the property the oracle gate enforces).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from ..session import local_frame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sq_dist(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")))
    return F.aggregate(d, F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _assign(vectors: DataFrame, cents: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    scored = vectors.crossJoin(F.broadcast(cents)).select(
        id_col,
        "cent_id",
        F.round(_sq_dist(F.col(vec_col), F.col("cent")), 6).alias("sq_dist"),
    )
    w = Window.partitionBy(id_col).orderBy("sq_dist", "cent_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def kmeans_assign(
    df: DataFrame,
    *,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic Lloyd's k-means: returns (id, cent_id, sq_dist).

    Seeds are the k vectors with the smallest md5(id) — a global top-k
    bounded by k. Assignment rounds the squared distance to 6dp with a
    cent_id tie-break; the mean update sums floor(v*scale) as BIGINT.
    """
    vectors = df.select(F.col(id_col), F.col(vec_col))
    seeds = (
        vectors.withColumn("__seed", F.md5(F.col(id_col).cast("string")))
        .orderBy("__seed", id_col)
        .limit(k)
    )
    sw = Window.orderBy("__seed", id_col)
    cents = seeds.select(
        F.row_number().over(sw).cast("int").alias("cent_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cent"),
    )
    assigned = _assign(vectors, cents, id_col, vec_col)
    for _ in range(iters - 1):
        exploded = assigned.join(vectors, on=id_col).select(
            "cent_id", F.posexplode(vec_col).alias("d", "val")
        )
        comps = exploded.groupBy("cent_id", "d").agg(
            (
                F.sum(F.floor(F.col("val").cast("double") * scale).cast("long")).cast("double")
                / (float(scale) * F.count("*"))
            ).alias("comp")
        )
        cents = comps.groupBy("cent_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "comp"))), lambda s: s.comp
            ).alias("cent")
        )
        assigned = _assign(vectors, cents, id_col, vec_col)
    return assigned


def cluster_balanced_sample(
    df: DataFrame,
    *,
    k: int = 4,
    iters: int = 3,
    keep_frac_denom: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity-preserving curation: md5-ranked 1/denom quota per
    k-means cluster. Returns (id, cent_id, pick_rank, cluster_size)."""
    assigned = kmeans_assign(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("cent_id").orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    cw = Window.partitionBy("cent_id")
    ranked = assigned.select(
        id_col,
        "cent_id",
        F.row_number().over(w).cast("bigint").alias("pick_rank"),
        F.count("*").over(cw).cast("bigint").alias("cluster_size"),
    )
    return ranked.filter(
        F.col("pick_rank") <= (F.col("cluster_size") / keep_frac_denom).cast("bigint")
    )


def pca_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 8,
) -> DataFrame:
    """Top principal component by power iteration: one distributed
    exact-sufficient-statistics pass over (row x dim x dim) cells with
    map-side partial aggregation, then a driver-side quantized iteration
    over the collected dim^2 covariance (corpus-size-independent — the
    same split MLlib's computePrincipalComponents uses). Returns
    (dim, pc1_loading, eigenvalue_fp9). Registered instance:
    embedding_pca_top_component (whose arithmetic this mirrors)."""
    spark = df.sparkSession
    dims_df = spark.range(1, dim + 1).select(F.col("id").cast("int").alias("d"))
    d1, d2 = dims_df.alias("d1"), dims_df.alias("d2")
    val = lambda side: F.floor(  # noqa: E731
        F.element_at(F.col(vec_col), F.col(f"{side}.d")).cast("double") * F.lit(1000000.0)
    ).cast("bigint")
    # upper triangle only — covariance is symmetric and every sufficient
    # statistic is symmetric under (i,j) swap, so the mirror below is
    # bit-exact and the per-row explode halves
    cells = (
        df.crossJoin(F.broadcast(d1))
        .crossJoin(F.broadcast(d2))
        .where(F.col("d2.d") >= F.col("d1.d"))
        .select(
            F.col("d1.d").alias("i"),
            F.col("d2.d").alias("j"),
            val("d1").alias("a_fp"),
            val("d2").alias("b_fp"),
        )
    )
    agg = cells.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("a_fp").cast("decimal(38,0)")).cast("double").alias("sa"),
        F.sum(F.col("b_fp").cast("decimal(38,0)")).cast("double").alias("sb"),
        F.sum((F.col("a_fp") * F.col("b_fp")).cast("decimal(38,0)")).cast("double").alias("sab"),
    )
    cov_df = agg.select(
        "i",
        "j",
        (
            (F.col("sab") / F.col("n") - (F.col("sa") / F.col("n")) * (F.col("sb") / F.col("n")))
            / F.lit(1000000000000.0)
        ).alias("c"),
    )
    cov = {(r["i"], r["j"]): r["c"] for r in cov_df.collect()}
    rows = power_iterate(cov, dim, iters)
    return local_frame(spark, rows, "dim int, pc1_loading double, eigenvalue_fp9 bigint")


def power_iterate(cov: dict, dim: int, iters: int) -> list:
    """Quantized power iteration over an upper-triangle (or full)
    covariance dict {(i, j): c}. Every expression mirrors the
    embedding_pca_top_component oracle SQL token-for-token (same IEEE
    operation order), so the BIGINT fixed-point state is identical
    across engines. Returns [(dim, pc1_loading, eigenvalue_fp9)]."""
    import math

    cov = dict(cov)
    cov.update({(j, i): c for (i, j), c in list(cov.items()) if i != j and (j, i) not in cov})
    rng = range(1, dim + 1)
    # uniform start with ||v||=1 (exact at dim=64: floor(0.125e12))
    start = math.floor(1.0 / math.sqrt(dim) * 1e12)
    v_fp = {d: start for d in rng}
    nrm = 1.0
    for _ in range(iters):
        # w_i = SUM(floor(c * (v_fp/1e12) * 1e15)) / 1e15  (exact int sum)
        w = {
            i: float(sum(math.floor(cov[(i, j)] * (v_fp[j] / 1e12) * 1e15) for j in rng)) / 1e15
            for i in rng
        }
        # nrm = greatest(sqrt(SUM(floor(w*w*1e9)) / 1e9), 1e-12)
        nrm = max(math.sqrt(float(sum(math.floor(w[i] * w[i] * 1e9) for i in rng)) / 1e9), 1e-12)
        v_fp = {d: math.floor(w[d] / nrm * 1e12) for d in rng}
    eig_fp9 = math.floor(nrm * 1e9)
    return [(int(d), float(v_fp[d]) / 1e12, eig_fp9) for d in rng]
