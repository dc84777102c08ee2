"""Every registered query with an oracle must match DuckDB at sf0.001 —
the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from datafusion_remote_table_spark import plans

plans.load_all()

ORACLED = sorted(n for n in plans.QUERIES if n in plans.ORACLE)
ROWS_ONLY = sorted(n for n in plans.QUERIES if n not in plans.ORACLE)

from .oracle_util import compare_pandas  # noqa: E402


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(qpandas, sf_dir, name):
    # qpandas collects all queries through a thread pool on first use
    # (guide §2.6); the strict compare itself is unchanged
    compare_pandas(qpandas(name), plans.ORACLE[name], sf_dir, label=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(qbuild, name):
    df = qbuild(name)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_verify_priority_lists_match_registry():
    """A typo in the driver-order priority lists would silently demote a
    query out of the verification budget — pin every name to the
    registry and forbid duplicates."""
    import __spark_entry__ as entry

    names = entry._VERIFY_FIRST + entry._VERIFY_SECOND
    assert len(names) == len(set(names)), "duplicate priority entries"
    missing = [n for n in names if n not in plans.QUERIES]
    assert not missing, f"priority entries not in registry: {missing}"
    ordered = list(entry.queries())
    assert ordered[: len(entry._VERIFY_FIRST)] == [
        n for n in entry._VERIFY_FIRST if n in plans.QUERIES
    ]


def test_sf_dir_probe_raises_named_error(spark):
    # VERDICT r7 item 5: a typo'd $SPARK_GRAFT_SF_DIR or missing parquet
    # must surface as a named load-time error, not a mid-query
    # AnalysisException
    import tempfile

    from datafusion_remote_table_spark.session import (
        TestDataNotFoundError,
        load_tables,
    )

    with pytest.raises(TestDataNotFoundError, match="not a directory"):
        load_tables(spark, "/no/such/sf_dir", ("orders",))
    with tempfile.TemporaryDirectory() as d:
        with pytest.raises(TestDataNotFoundError, match="orders"):
            load_tables(spark, d, ("orders",))
