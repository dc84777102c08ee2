"""Every registered query with an oracle must match DuckDB at sf0.001 —
the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from datafusion_remote_table_spark import plans

plans.load_all()

ORACLED = sorted(n for n in plans.QUERIES if n in plans.ORACLE)
ROWS_ONLY = sorted(n for n in plans.QUERIES if n not in plans.ORACLE)

from .oracle_util import compare  # noqa: E402


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    df = plans.QUERIES[name](spark, sf_dir)
    compare(df, plans.ORACLE[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = plans.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
