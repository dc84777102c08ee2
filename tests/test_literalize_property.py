"""Property test: any value the dialect can literalize must round-trip
through a real SQL engine (sqlite + duckdb) — the guarantee the
reference's literalize.rs provides per-dialect."""

from __future__ import annotations

import datetime as dt
import math
import sqlite3

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_remote_table_spark.remote.dialect import dialect_for

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40).filter(lambda s: "\x00" not in s),
    st.binary(min_size=1, max_size=20),
)


def test_nul_string_is_unsupported_not_broken():
    # NUL can't be rendered into SQL text; literalize refuses (the filter
    # then falls back to Spark-side evaluation via split_filters)
    import pytest

    from datafusion_remote_table_spark.remote.dialect import dialect_for as _d
    from datafusion_remote_table_spark.remote.unparse import split_filters
    from pyspark.sql.datasource import EqualTo

    with pytest.raises(TypeError):
        _d("sqlite").literal("a\x00b")
    pushed, unsupported = split_filters([EqualTo(("c",), "a\x00b")], _d("sqlite"))
    assert pushed == [] and len(unsupported) == 1


@settings(max_examples=200, deadline=None)
@given(value=_scalars)
def test_sqlite_literal_roundtrip(value):
    lit = dialect_for("sqlite").literal(value)
    got = sqlite3.connect(":memory:").execute(f"SELECT {lit}").fetchone()[0]
    _assert_equiv(got, value, backend="sqlite")


@settings(max_examples=200, deadline=None)
@given(value=_scalars)
def test_duckdb_literal_roundtrip(value):
    lit = dialect_for("duckdb").literal(value)
    got = duckdb.connect().execute(f"SELECT {lit}").fetchone()[0]
    _assert_equiv(got, value, backend="duckdb")


@settings(max_examples=100, deadline=None)
@given(
    value=st.datetimes(
        min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2200, 1, 1)
    )
)
def test_duckdb_timestamp_literal_roundtrip(value):
    lit = dialect_for("duckdb").literal(value)
    got = duckdb.connect().execute(f"SELECT {lit}").fetchone()[0]
    assert got == value


def _assert_equiv(got, want, backend):
    if want is None:
        assert got is None
    elif isinstance(want, bool):
        assert got == (1 if want else 0) or got is want
    elif isinstance(want, float):
        assert isinstance(got, float) and (math.isclose(got, want, rel_tol=1e-15) or got == want)
    elif isinstance(want, bytes):
        assert bytes(got) == want
    else:
        assert got == want
