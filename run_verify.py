"""Driver-contract verify (see .claude/skills/verify/SKILL.md).

Runs entry() as a smoke check, then every queries()[name] at sf0.01
against oracle_sql()[name] in DuckDB. Usage:

    python run_verify.py [name ...]   # no args = all queries
"""

import sys

sys.path.insert(0, "/root/repo")
import duckdb
import numpy as np

import __spark_entry__ as e
from datafusion_remote_table_spark.session import get_spark

spark = get_spark("verify")
print("entry rows:", len(e.entry(spark).collect()), flush=True)
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
qs, os_ = e.queries(), e.oracle_sql()
only = set(sys.argv[1:])
fails = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    try:
        df = fn(spark, SF)
        got = df.toPandas().reindex(sorted(df.columns), axis=1)
        if name not in os_:
            print("ROWS-ONLY", name, len(got), flush=True)
            continue
        want = con.execute(os_[name]).fetchdf()
        want = want.reindex(sorted(want.columns), axis=1)
        assert list(got.columns) == list(want.columns) and len(got) == len(want), "shape"
        assert len(got) > 0, "VACUOUS (0 rows proves nothing)"
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        for c in gs.columns:
            g, w = gs[c].to_numpy(), ws[c].to_numpy()
            ok = (np.isclose(g.astype(float), w.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True)
                  if np.issubdtype(np.asarray(g).dtype, np.floating) else np.asarray(g == w))
            assert ok.all(), (name, c)
        print("MATCH", name, len(got), flush=True)
    except Exception as ex:  # noqa: BLE001
        fails.append(name)
        print("FAIL", name, repr(ex)[:150], flush=True)
print("FAILS:", fails)
assert not fails
