"""Driver-contract verify (see .claude/skills/verify/SKILL.md).

Runs entry() as a smoke check, then every queries()[name] at sf0.01
against oracle_sql()[name] in DuckDB, via the STRICT compare in
tests/oracle_util.py (per-column dtype-family equality + exact float
equality with a warned isclose fallback — the same classes the driver's
value-hash catches). Usage:

    python run_verify.py [name ...]   # no args = all queries
"""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as e
from datafusion_remote_table_spark.session import get_spark
from tests import oracle_util
from tests.oracle_util import compare

spark = get_spark("verify")
print("entry rows:", len(e.entry(spark).collect()), flush=True)
SF = "/root/testdata/sf0.01"
qs, os_ = e.queries(), e.oracle_sql()
only = set(sys.argv[1:])
fails = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    try:
        df = fn(spark, SF)
        if name not in os_:
            print("ROWS-ONLY", name, df.count(), flush=True)
            continue
        compare(df, os_[name], SF, label=name, require_rows=True)
        print("MATCH", name, flush=True)
    except Exception as ex:  # noqa: BLE001
        fails.append(name)
        print("FAIL", name, repr(ex)[:200], flush=True)
warned = sorted({(lbl, col) for lbl, col, _ in oracle_util.WARNINGS})
print("FAILS:", fails)
print("WARNS:", warned)
# SKILL.md: any WARN is a bug — a warned pass is a query whose driver
# hash may still fail, so it counts against the sweep like a FAIL.
assert not fails and not warned
