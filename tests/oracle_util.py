"""Local emulation of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet tables, sort columns by name,
sort rows, compare values.

STRICT by design (round-6 hardening): the driver's value-hash is exact and
dtype-sensitive, so this compare (a) asserts per-column dtype-FAMILY
equality (int vs float vs bool vs object) — this catches DuckDB HUGEINT
(window SUM, SUM(BIGINT)) surfacing as float64 against Spark's int64, the
exact class that shipped the round-5 `events_survival_curve` red row — and
(b) asserts EXACT float equality, falling back to np.isclose only with a
printed WARN (a warned pass is a query whose driver hash may still fail).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

# Machine-visible record of every isclose-fallback WARN emitted by
# compare() (label, column, message). A warned pass is a query whose
# driver hash may still FAIL; run_verify.py reports this list beside
# FAILS and exits nonzero if it is nonempty, so a WARN can no longer
# scroll past unnoticed in a 380+-query sweep.
WARNINGS: list[tuple[str, str, str]] = []

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


def _family(arr: np.ndarray) -> str:
    dt = np.asarray(arr).dtype
    if np.issubdtype(dt, np.bool_):
        return "bool"
    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.floating):
        return "float"
    return "object"


def compare(spark_df, oracle: str, sf_dir: str, float_rtol: float = 1e-9,
            label: str = "", require_rows: bool = False) -> None:
    compare_pandas(
        spark_df.toPandas(), oracle, sf_dir,
        float_rtol=float_rtol, label=label, require_rows=require_rows,
    )


def compare_pandas(got_pd: pd.DataFrame, oracle: str, sf_dir: str,
                   float_rtol: float = 1e-9, label: str = "",
                   require_rows: bool = False) -> None:
    """compare() with the Spark collect already done — lets a caller run
    many independent toPandas actions concurrently (guide §2.6) and feed
    the results through the identical strict checks serially."""
    got = _canon(got_pd)
    if require_rows:
        assert len(got) > 0, "VACUOUS (0 rows proves nothing)"
    con = duckdb_conn(sf_dir)
    want = _canon(con.execute(oracle).fetchdf())
    con.close()

    assert list(got.columns) == list(want.columns), f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"row count differs: {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        gf, wf = _family(g), _family(w)
        assert gf == wf, (
            f"column {c}: dtype family {gf} (spark {g.dtype}) vs {wf} (oracle "
            f"{np.asarray(w).dtype}) — driver value-hash WILL differ (HUGEINT class)"
        )
        if gf == "float":
            g = g.astype(float)
            w = np.asarray(w, dtype=float)
            both_nan = np.isnan(g) & np.isnan(w)
            exact = (g == w) | both_nan
            if not exact.all():
                close = np.isclose(g, w, rtol=float_rtol, atol=1e-9) | both_nan
                assert close.all(), f"column {c}: {np.count_nonzero(~close)} mismatches, e.g. {g[~close][:3]} vs {w[~close][:3]}"
                msg = (
                    f"{np.count_nonzero(~exact)} float values only isclose, not exact "
                    f"(e.g. {g[~exact][:2]} vs {w[~exact][:2]}) — driver hash may FAIL"
                )
                WARNINGS.append((label or "compare", c, msg))
                print(f"WARN {label or 'compare'} column {c}: {msg}", flush=True)
        else:
            eq = g == w
            assert eq.all(), f"column {c}: {np.count_nonzero(~eq)} mismatches, e.g. {g[~eq][:3]} vs {w[~eq][:3]}"
