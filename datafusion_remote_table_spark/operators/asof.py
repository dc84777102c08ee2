"""As-of join: for each left row, the most recent right row (by event
time) with right_ts <= left_ts, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The scalable
expression is union + window, not a range join: tag both sides, sort
each key's timeline once, and carry the latest right payload forward
with last(ignorenulls) — one shuffle on the key, no range-predicate
explosion, state bounded per partition. This is the standard
time-series enrichment shape (trades ⋈ quotes, events ⋈ dim-history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Backward (inclusive) as-of join.

    Returns all left columns plus `right_payload` columns from the
    matching right row (NULL when no right row precedes the left row).
    `tie_break` orders right rows sharing one timestamp (last wins) so
    results are deterministic. The right payload travels as one struct,
    so all payload columns always come from the same right row.
    """
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    r_tag = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        payload_struct.alias("__r"),
    )
    l_tag = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    r_tag = r_tag.withColumn("__left", F.lit(None).cast(l_tag.schema["__left"].dataType))
    l_tag = l_tag.withColumn("__r", F.lit(None).cast(r_tag.schema["__r"].dataType))

    ordering = [F.col("__ts"), F.col("__is_left")] + (
        [F.col(f"__r.{tie_break}").asc_nulls_first()] if tie_break else []
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionByName(r_tag)
    carried = merged.select(
        "__is_left",
        "__left",
        F.last("__r", ignorenulls=True).over(w).alias("__rr"),
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rr.{c}").alias(c) for c in right_payload],
    )
