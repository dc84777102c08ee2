"""Local emulation of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet tables, sort columns by name,
sort rows, compare values (exact for non-floats, tight tolerance for floats).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle: str, sf_dir: str, float_rtol: float = 1e-9) -> None:
    got = _canon(spark_df.toPandas())
    con = duckdb_conn(sf_dir)
    want = _canon(con.execute(oracle).fetchdf())
    con.close()

    assert list(got.columns) == list(want.columns), f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"row count differs: {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(np.asarray(w).dtype, np.floating):
            g = g.astype(float)
            w = np.asarray(w, dtype=float)
            both_nan = np.isnan(g) & np.isnan(w)
            close = np.isclose(g, w, rtol=float_rtol, atol=1e-9) | both_nan
            assert close.all(), f"column {c}: {np.count_nonzero(~close)} mismatches, e.g. {g[~close][:3]} vs {w[~close][:3]}"
        else:
            eq = g == w
            assert eq.all(), f"column {c}: {np.count_nonzero(~eq)} mismatches, e.g. {g[~eq][:3]} vs {w[~eq][:3]}"
