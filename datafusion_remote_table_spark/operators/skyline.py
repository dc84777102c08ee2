"""Distributed skyline (Pareto-front) operator.

Shape follows the two-phase algorithm from the Spark skyline literature
(e.g. "Integration of Skyline Queries into Spark SQL", EDBT 2023 —
algorithmic idea only): each partition computes its local skyline
(mapInPandas, vectorized dominance check), then the union of local
skylines — already tiny — is reduced once more for the global skyline.
A point survives iff no other point is <= on every dimension and < on
at least one (all dimensions minimized).

Scale: dominance pruning happens where the data lives; only local
skyline points (typically O(log^d n)) cross the network, and the final
reduce handles a small candidate set. No pairwise shuffle ever happens
on the full relation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def _local_skyline(pdf: pd.DataFrame, dims: list[str]) -> pd.DataFrame:
    if len(pdf) == 0:
        return pdf
    vals = pdf[dims].to_numpy()
    n = len(vals)
    keep = []
    for i in range(n):
        v = vals[i]
        le = (vals <= v).all(axis=1)
        lt = (vals < v).any(axis=1)
        dominated = (le & lt).any()
        if not dominated:
            keep.append(i)
    return pdf.iloc[keep]


def skyline(df: DataFrame, dims: list[str], fanin: int = 64) -> DataFrame:
    """All-dimensions-minimized skyline of df over `dims`.

    The reduce is a bounded-fan-in TREE, not a flat coalesce(1): each
    level merges at most ``fanin`` partitions' local skylines and prunes
    dominated points before the next level, so no single task ever
    concatenates more than ``fanin`` candidate sets — the valve for the
    degenerate (anti-correlated) case where per-partition skylines are
    large. Levels = ceil(log_fanin(P)): 100k-partition input reduces in
    3 levels. Correctness: dominance is transitive, so pruning at any
    level never removes a global skyline point (skyline of a union ⊇
    skyline of the whole — the final level is exact)."""

    def local(batches):
        frames = [_local_skyline(pdf, dims) for pdf in batches if len(pdf)]
        if frames:  # empty partition -> no output, not a concat error
            yield _local_skyline(pd.concat(frames, ignore_index=True), dims)

    fanin = max(2, fanin)  # fanin=1 would never converge; 0 divides by zero
    candidates = df.mapInPandas(local, schema=df.schema)
    parts = candidates.rdd.getNumPartitions()
    while parts > 1:
        parts = max(1, -(-parts // fanin))
        candidates = candidates.coalesce(parts).mapInPandas(local, schema=df.schema)
    return candidates
