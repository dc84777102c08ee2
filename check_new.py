"""Session helper: driver-style compare for a list of query names at sf0.001.

Usage: python check_new.py name1 name2 ...   [SF=/root/testdata/sf0.001]
"""

from __future__ import annotations

import os
import sys
import time

from datafusion_remote_table_spark import plans
from datafusion_remote_table_spark.session import get_spark
from tests.oracle_util import compare

SF = os.environ.get("SF", "/root/testdata/sf0.001")


def main(names: list[str]) -> int:
    plans.load_all()
    spark = get_spark("check-new", master="local[8]")
    failed = 0
    for name in names:
        t0 = time.time()
        try:
            df = plans.QUERIES[name](spark, SF)
            if name in plans.ORACLE:
                compare(df, plans.ORACLE[name], SF)
                status = "MATCH"
            else:
                n = df.count()
                status = f"rows-only ({n} rows)"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL: {type(e).__name__}: {e}"
            failed += 1
        print(f"{name}: {status} [{time.time() - t0:.1f}s]", flush=True)
    return failed


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
