"""Distributed sketch operators as reusable DataFrame APIs: count-min
frequency sketching and HyperLogLog distinct counting.

Tunable twins of the registered ``heavy_hitters_countmin`` /
``approx_distinct_hll`` queries (plans/llm_data.py). Both are the
canonical 100TB sketch shapes: map-side hashing into CONSTANT-SIZE
state (d×w cells / m registers) merged with one small shuffle —
the raw keys are never globally shuffled for the estimate.
Determinism: md5-keyed hashing and integer cell/register arithmetic,
so results are engine- and order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(row_expr: str, val_col: str, width: int) -> F.Column:
    return F.expr(
        f"CAST(conv(substring(md5(CAST({row_expr} AS STRING) || chr(58) || {val_col}), 1, 8),"
        f" 16, 10) AS BIGINT) % {width}"
    )


def countmin_sketch(df: DataFrame, col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Build the d×w count-min grid over ``df[col]`` occurrences.
    Returns (r, bkt, cell): constant-size state regardless of input
    cardinality — each row hashes map-side into ``depth`` salted cells
    and the grid merges with one (r, bkt)-keyed aggregation."""
    rows = df.select(
        F.col(col).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    )
    return (
        rows.withColumn("bkt", _bucket("r", "__v", width))
        .groupBy("r", "bkt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cell"))
    )


def countmin_estimate(
    sketch: DataFrame, candidates: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query the sketch for each candidate value: MIN over the
    ``depth`` rows (the CM upper-bound guarantee). The join touches
    |candidates| × depth rows — broadcastable for any reasonable
    candidate list."""
    cand = candidates.select(F.col(col).alias("__v")).distinct()
    probes = cand.select(
        "__v", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    ).withColumn("bkt", _bucket("r", "__v", width))
    joined = probes.join(sketch, ["r", "bkt"], "left")
    return (
        joined.groupBy("__v")
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).cast("bigint").alias("cm_estimate"))
        .select(F.col("__v").alias(col), "cm_estimate")
    )


def hll_distinct(
    df: DataFrame, col: str, group_cols: tuple[str, ...] = (), registers: int = 256
) -> DataFrame:
    """HyperLogLog distinct-count estimate of ``df[col]`` per group.
    Register ranks use trailing zeros of the md5 hash remainder;
    register sums run in integer powers (SUM of 2^(53-m) as BIGINT,
    exact) with small-range linear counting below 2.5m — identical to
    the registered query's algorithm."""
    gcols = list(group_cols)
    h = "CAST(conv(substring(md5(__v), 1, 15), 16, 10) AS BIGINT)"
    hashed = df.select(
        *gcols, F.col(col).cast("string").alias("__v")
    ).dropDuplicates(gcols + ["__v"]).select(
        *gcols,
        F.expr(f"({h}) % {registers}").alias("bucket"),
        F.expr(f"({h}) DIV {registers}").alias("rest"),
    )
    ranked = hashed.withColumn(
        "rho",
        F.expr(
            "COALESCE(array_min(filter(sequence(1, 53), "
            "k -> (rest % shiftleft(CAST(1 AS BIGINT), k)) <> 0)), 53)"
        ),
    )
    regs = ranked.groupBy(*gcols, "bucket").agg(F.max("rho").alias("m"))
    merged = regs.groupBy(*gcols).agg(
        F.expr("CAST(SUM(shiftleft(CAST(1 AS BIGINT), 53 - m)) AS BIGINT)").alias("s_int"),
        (F.lit(registers) - F.count(F.lit(1))).cast("bigint").alias("n_zero_regs"),
    )
    alpha = 0.7213 / (1 + 1.079 / registers)
    raw = (
        F.lit(alpha)
        * F.lit(registers)
        * F.lit(registers)
        * F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 53) AS DOUBLE)")
        / F.col("s_int")
    )
    est = F.when(
        (raw <= F.lit(2.5 * registers)) & (F.col("n_zero_regs") > 0),
        F.lit(registers) * F.log(F.lit(float(registers)) / F.col("n_zero_regs")),
    ).otherwise(raw)
    return merged.select(*gcols, "n_zero_regs", F.round(est, 4).alias("hll_estimate"))
