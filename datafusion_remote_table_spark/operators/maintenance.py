"""Lakehouse table-maintenance operators as reusable DataFrame APIs:
generic MERGE INTO (upsert) and CDC changelog derivation.

These are the tunable twins of the registered ``orders_merge_upsert`` /
``orders_cdc_changelog`` queries (plans/relational.py), generalized to
arbitrary key/value columns. Scale: each is ONE full-outer shuffle join
on the key columns — the physical plan Delta/Iceberg MERGE lowers to;
the changelog's up-to-two rows per key come from exploding a per-row
op array (single pass, never one join per op type).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _join_cond(keys: tuple[str, ...]):
    return reduce(
        lambda a, b: a & b,
        [F.col(f"b.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys],
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    update_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """MERGE INTO semantics: matched keys take the update's values for
    ``update_cols`` (default: every non-key column the update carries),
    unmatched update rows insert, untouched base rows are kept. Adds a
    ``merge_op`` column ('updated' / 'inserted' / 'kept'). Key columns
    must be non-null on both sides (the join is null-safe but the op
    classification tests the first key for side presence)."""
    ucols = tuple(update_cols or [c for c in updates.columns if c not in key_cols])
    joined = base.alias("b").join(updates.alias("u"), _join_cond(tuple(key_cols)), "full_outer")
    first = key_cols[0]
    out = [F.coalesce(F.col(f"b.{k}"), F.col(f"u.{k}")).alias(k) for k in key_cols]
    for c in base.columns:
        if c in key_cols:
            continue
        if c in ucols:
            out.append(F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c))
        else:
            out.append(F.col(f"b.{c}").alias(c))
    out.append(
        F.when(F.col(f"b.{first}").isNull(), F.lit("inserted"))
        .when(F.col(f"u.{first}").isNull(), F.lit("kept"))
        .otherwise(F.lit("updated"))
        .alias("merge_op")
    )
    return joined.select(*out)


def cdc_changelog(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
    value_cols: tuple[str, ...],
) -> DataFrame:
    """Changelog between two snapshots in Flink/Debezium op terms:
    '+I' for keys only in ``new``, '-D' for keys only in ``old``, and a
    '-U'/'+U' retract pair when any value column changed. Unchanged
    keys emit nothing. Output: key columns, ``op``, value columns."""
    keys = tuple(key_cols)
    joined = old.alias("b").join(new.alias("u"), _join_cond(keys), "full_outer")
    first = keys[0]
    is_ins = F.col(f"b.{first}").isNull()
    is_del = F.col(f"u.{first}").isNull()
    differ = reduce(
        lambda a, b: a | b,
        [~F.col(f"b.{c}").eqNullSafe(F.col(f"u.{c}")) for c in value_cols],
    )
    old_row = F.struct(F.lit("-U").alias("op"), *[F.col(f"b.{c}").alias(c) for c in value_cols])
    del_row = F.struct(F.lit("-D").alias("op"), *[F.col(f"b.{c}").alias(c) for c in value_cols])
    new_row = F.struct(F.lit("+U").alias("op"), *[F.col(f"u.{c}").alias(c) for c in value_cols])
    ins_row = F.struct(F.lit("+I").alias("op"), *[F.col(f"u.{c}").alias(c) for c in value_cols])
    # the typed empty array comes from slicing a populated one — no
    # hand-written struct DDL to drift from the real column types
    changes = (
        F.when(is_ins, F.array(ins_row))
        .when(is_del, F.array(del_row))
        .when(differ, F.array(old_row, new_row))
        .otherwise(F.slice(F.array(ins_row), 1, 0))
    )
    keyed = joined.select(
        *[F.coalesce(F.col(f"b.{k}"), F.col(f"u.{k}")).alias(k) for k in keys],
        F.explode(changes).alias("c"),
    )
    return keyed.select(
        *keys,
        F.col("c.op").alias("op"),
        *[F.col(f"c.{c}").alias(c) for c in value_cols],
    )
