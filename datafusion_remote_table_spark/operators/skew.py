"""Skew-mitigation join helpers.

AQE's skew-join split (on by default in session.py) handles most cases
at runtime; `salted_join` is the explicit valve for joins AQE can't
split — e.g. a hot key joined against a non-broadcastable mid-size
table: the hot side gets a random salt in [0, n), the other side is
replicated n ways, and the join key becomes (key, salt), spreading one
hot key over n reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join `skewed ⋈ other` on column `on`, salting the skewed side.

    `other` rows are exploded n_salts× (keep it the smaller side);
    result columns match a plain `skewed.join(other, on, how)`.
    """
    salted = skewed.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted.join(replicated, on=[on, "__salt"], how=how)
    return out.drop("__salt")
