"""Explicit predicate pushdown (RemoteTable.read(predicate=...)).

The reference pushes ANY expression that unparses cleanly — including
OR-disjunctions, BETWEEN, arithmetic — and rejects scalar functions
(transform.rs:52-86, table.rs:382-420). PySpark's Python DataSource
filter API only delivers atomic conjuncts, so the explicit predicate
argument closes the gap. These tests pin (a) the per-dialect rendering
(golden strings, the wire stand-in), (b) validation failures, and (c)
live row parity on sqlite/duckdb."""

from __future__ import annotations

import datetime as dt

import pytest

from datafusion_remote_table_spark.remote.dialect import dialect_for
from datafusion_remote_table_spark.remote.predicate import (
    PredicateError,
    render_predicate,
)

OR_BETWEEN = (
    "(status = 'F' AND total BETWEEN 1000 AND 50000) "
    "OR (priority LIKE '1-%' AND total > 150000)"
)


# ---------------------------------------------------------------------------
# golden rendering per server dialect (OR + BETWEEN, the reference's
# arbitrary-expression pushdown examples)
@pytest.mark.parametrize(
    "backend,quote",
    [
        ("postgres", '"'),
        ("gaussdb", '"'),
        ("duckdb", '"'),
        ("sqlite", '"'),
        ("oracle", '"'),
        ("dm", '"'),
        ("mysql", "`"),
    ],
)
def test_or_between_like_golden(backend, quote):
    q = lambda c: f"{quote}{c}{quote}"  # noqa: E731
    got = render_predicate(OR_BETWEEN, dialect_for(backend))
    want = (
        f"(({q('status')} = 'F' AND {q('total')} BETWEEN 1000 AND 50000) "
        f"OR ({q('priority')} LIKE '1-%' AND {q('total')} > 150000))"
    )
    assert got == want


def test_arithmetic_and_dates_render_per_dialect():
    pred = "price * (1 - discount) > 900 AND shipdate >= DATE '1994-01-01'"
    pg = render_predicate(pred, dialect_for("postgres"))
    assert pg == (
        '(("price" * (1 - "discount")) > 900 AND "shipdate" >= DATE \'1994-01-01\')'
    )
    # sqlite has no DATE keyword literal: its dialect renders a plain string
    sq = render_predicate(pred, dialect_for("sqlite"))
    assert "DATE" not in sq and "'1994-01-01'" in sq


def test_in_list_and_not():
    got = render_predicate(
        "region IN ('ASIA', 'EUROPE') AND NOT (size = 5)", dialect_for("postgres")
    )
    assert got == "(\"region\" IN ('ASIA', 'EUROPE') AND NOT (\"size\" = 5))"


def test_float_literals_force_double_spelling():
    # bare 0.1 parses as DECIMAL in duckdb/postgres — the dialect's float
    # rendering appends the exponent, same as the Catalyst pushdown path
    got = render_predicate("discount < 0.07", dialect_for("duckdb"))
    assert got == '"discount" < 0.07e0'


# ---------------------------------------------------------------------------
# validation: the parse-then-render round trip REJECTS what can't push
def test_unknown_column_rejected():
    with pytest.raises(PredicateError, match="unknown column"):
        render_predicate("nope = 1", dialect_for("sqlite"), columns=["a", "b"])


def test_scalar_functions_rejected():
    # the reference's rule: scalar functions don't round-trip (transform.rs)
    with pytest.raises(PredicateError, match="scalar function"):
        render_predicate("upper(name) = 'X'", dialect_for("postgres"))


@pytest.mark.parametrize(
    "bad",
    [
        "a = 1; DROP TABLE t",  # statement separator never parses
        "a = 'unterminated",
        "a = ",
        "a BETWEEN 1",
        "(a = 1",
        "a LIKE b",  # LIKE pattern must be a string literal
    ],
)
def test_malformed_predicates_rejected(bad):
    with pytest.raises(PredicateError):
        render_predicate(bad, dialect_for("postgres"))


def test_string_quotes_reescaped_not_interpolated():
    # a quote inside a literal survives the parse and re-renders escaped
    got = render_predicate("name = 'O''Brien'", dialect_for("postgres"))
    assert got == "\"name\" = 'O''Brien'"


def test_date_and_timestamp_literals_typed():
    got = render_predicate(
        "ts >= TIMESTAMP '2024-01-02 03:04:05'", dialect_for("postgres")
    )
    assert got.startswith('"ts" >= TIMESTAMP ')
    with pytest.raises(PredicateError, match="bad DATE"):
        render_predicate("d = DATE 'not-a-date'", dialect_for("postgres"))


# ---------------------------------------------------------------------------
# live: the predicate lands in the composed remote SQL and rows match
def test_live_sqlite_predicate_rows_match(spark, sf_dir):
    from datafusion_remote_table_spark.plans import remote_queries as RQ
    from datafusion_remote_table_spark.remote import RemoteTable

    opts = RQ._sqlite_opts(sf_dir)
    t = RemoteTable(opts, ["orders"])
    pred = "(o_totalprice BETWEEN 1000 AND 2000) OR o_orderpriority LIKE '5-%'"
    pushed = t.read(spark, predicate=pred)
    everything = t.read(spark)
    want = everything.filter(
        "(o_totalprice BETWEEN 1000 AND 2000) OR o_orderpriority LIKE '5-%'"
    )
    assert sorted(r.o_orderkey for r in pushed.collect()) == sorted(
        r.o_orderkey for r in want.collect()
    )
    # and the remote SQL really carries the disjunction
    from datafusion_remote_table_spark.remote.predicate import render_predicate as rp

    spec = t.spec(pushed_filters=[rp(pred, t.spec().dialect)])
    sql = spec.remote_sql()
    assert "OR" in sql and "BETWEEN" in sql and sql.startswith("SELECT * FROM")


def test_insert_select_runs_remotely_and_validates(spark, sf_dir):
    import sqlite3

    from datafusion_remote_table_spark.plans import remote_queries as RQ
    from datafusion_remote_table_spark.remote import RemoteTable

    path = RQ.ensure_sqlite_remote(sf_dir)
    con = sqlite3.connect(path)
    con.execute("DROP TABLE IF EXISTS t_isel")
    con.execute("CREATE TABLE t_isel (o_orderkey, o_totalprice)")
    con.commit()
    con.close()
    t = RemoteTable(RQ._sqlite_opts(sf_dir), ["t_isel"])
    n = t.insert_select(
        "SELECT o_orderkey, o_totalprice FROM orders",
        predicate="o_totalprice BETWEEN 1000 AND 2000",
    )
    got = t.read(spark).count()
    assert got > 0 and (n == got or n == -1)
    # malformed predicates must fail BEFORE touching the remote
    from datafusion_remote_table_spark.remote.predicate import PredicateError
    import pytest as _pytest

    with _pytest.raises(PredicateError):
        t.insert_select("SELECT 1", predicate="o_totalprice ; DROP TABLE t_isel")
    # a query-source RemoteTable refuses (insert.rs contract)
    q = RemoteTable(RQ._sqlite_opts(sf_dir), "SELECT 1 AS x")
    with _pytest.raises(ValueError):
        q.insert_select("SELECT 1")


def test_delete_update_validate_before_touching_remote(spark, sf_dir):
    import sqlite3

    from datafusion_remote_table_spark.plans import remote_queries as RQ
    from datafusion_remote_table_spark.remote import RemoteTable
    from datafusion_remote_table_spark.remote.predicate import PredicateError

    path = RQ.ensure_sqlite_remote(sf_dir)
    con = sqlite3.connect(path)
    con.execute("DROP TABLE IF EXISTS t_dml")
    con.execute("CREATE TABLE t_dml AS SELECT * FROM orders")
    con.commit()
    before = con.execute("SELECT COUNT(*) FROM t_dml").fetchone()[0]
    con.close()
    t = RemoteTable(RQ._sqlite_opts(sf_dir), ["t_dml"])
    with pytest.raises(ValueError):
        t.delete_where("")  # bare delete-all refused
    with pytest.raises(PredicateError):
        t.delete_where("no_such_col = 1")  # schema-validated
    with pytest.raises(PredicateError):
        t.update_where({"o_totalprice": "upper(o_orderstatus)"})  # scalar fn
    with pytest.raises(ValueError):
        t.update_where({"no_such_col": "1"})
    con = sqlite3.connect(path)
    after = con.execute("SELECT COUNT(*) FROM t_dml").fetchone()[0]
    con.close()
    assert after == before, "a rejected statement must not touch the remote"
    n = t.delete_where("o_totalprice < 0")  # matches nothing, runs fine
    assert n in (0, -1)


def test_add_column_validates_and_reinfers(spark, sf_dir):
    import sqlite3

    from datafusion_remote_table_spark.plans import remote_queries as RQ
    from datafusion_remote_table_spark.remote import RemoteTable
    from datafusion_remote_table_spark.remote.predicate import PredicateError

    path = RQ.ensure_sqlite_remote(sf_dir)
    con = sqlite3.connect(path)
    con.execute("DROP TABLE IF EXISTS t_evolve")
    con.execute("CREATE TABLE t_evolve AS SELECT * FROM nation")
    con.commit()
    con.close()
    t = RemoteTable(RQ._sqlite_opts(sf_dir), ["t_evolve"])
    ncols_before = len(t.schema.fields)
    with pytest.raises(ValueError):
        t.add_column("bad name", "DOUBLE")  # identifier validated
    with pytest.raises(ValueError):
        t.add_column("x", "DOUBLE; DROP TABLE t_evolve")  # type validated
    with pytest.raises(ValueError):
        t.add_column("n_name", "TEXT")  # duplicate refused
    with pytest.raises(PredicateError):
        t.add_column("x", "DOUBLE", backfill="upper(n_name)")  # scalar fn
    assert len(t.schema.fields) == ncols_before, "rejected DDL must not apply"
    t.add_column("key2", "BIGINT", backfill="n_nationkey * 10")
    assert [f.name for f in t.schema.fields][-1] == "key2"  # re-inferred
    rows = {r["n_nationkey"]: r["key2"] for r in t.read(spark).collect()}
    assert all(v == k * 10 for k, v in rows.items()), "backfill ran remotely"
