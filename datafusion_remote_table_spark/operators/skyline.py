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


def skyline(df: DataFrame, dims: list[str]) -> DataFrame:
    """All-dimensions-minimized skyline of df over `dims`."""

    def local(batches):
        for pdf in batches:
            yield _local_skyline(pdf, dims)

    candidates = df.mapInPandas(local, schema=df.schema)

    # global pass: candidates are few; single-partition exact reduce
    def global_reduce(batches):
        frames = [b for b in batches if len(b)]
        if frames:  # empty input -> empty result, not a concat error
            yield _local_skyline(pd.concat(frames, ignore_index=True), dims)

    return candidates.coalesce(1).mapInPandas(global_reduce, schema=df.schema)
