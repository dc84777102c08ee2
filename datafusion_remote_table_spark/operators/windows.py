"""Event-time windowing helpers (batch): gap-based sessionization and
tumbling windows as reusable DataFrame transforms.

Scale: one shuffle on the entity key; everything after is per-partition
sorted streaming — the batch analogue of a streaming session window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-key session_id that increments whenever the gap from
    the previous event exceeds `gap_seconds`. Adds `session_id`."""
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | ((F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts)) > gap_seconds),
        1,
    ).otherwise(0)
    running = Window.partitionBy(key_col).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(is_new).over(running).cast("bigint"))


def tumbling_window(
    df: DataFrame, ts_col: str = "ts", width: str = "1 hour"
) -> DataFrame:
    """Add window_start/window_end columns for a tumbling window."""
    w = F.window(F.col(ts_col), width)
    return df.withColumn("window_start", w.start).withColumn("window_end", w.end)
