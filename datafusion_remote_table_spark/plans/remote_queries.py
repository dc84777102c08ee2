"""Driver-gated correctness entries for the remote-table engine
(SURVEY.md §2.A): each builds a real "remote" database (sqlite /
duckdb file) from the scale-factor parquet, reads it back through the
federated engine, and is oracled by DuckDB over the same parquet views.

Determinism: remote DBs are rebuilt only when missing (content is a
pure function of sf_dir); int columns come back as BIGINT from sqlite,
so oracles CAST key columns to BIGINT to keep schemas aligned.
"""

from __future__ import annotations

import hashlib
import os
import sqlite3
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..remote import (
    DuckdbConnectionOptions,
    RemoteScanSpec,
    RemoteTable,
    SqliteConnectionOptions,
)
from ..remote.transform import RemoteTransform
from ..session import load_tables, local_frame
from . import register

_SQLITE_TABLES = {
    "region": ("r_regionkey", "r_name"),
    "nation": ("n_nationkey", "n_name", "n_regionkey"),
    "supplier": ("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "customer": ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "orders": ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
}


def _cache_path(sf_dir: str, suffix: str, spec: str | None = None) -> str:
    # key includes the mirrored-schema spec so a stale cache from an older
    # code revision can never be read back
    if spec is None:
        spec = repr(sorted(_SQLITE_TABLES.items()))
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|{spec}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"dfrt_remote_{key}{suffix}")


def ensure_sqlite_remote(sf_dir: str) -> str:
    """Mirror the small/dimension tables into a sqlite file — the stand-in
    remote OLTP database for this environment (driver-side, once)."""
    import duckdb

    path = _cache_path(sf_dir, ".db")
    if os.path.exists(path):
        return path
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    con = sqlite3.connect(tmp)
    ddb = duckdb.connect()
    try:
        for table, cols in _SQLITE_TABLES.items():
            col_list = ", ".join(cols)
            rows = ddb.execute(
                f"SELECT {col_list} FROM read_parquet('{os.path.join(sf_dir, table)}.parquet')"
            ).fetchall()
            placeholders = ", ".join(["?"] * len(cols))
            con.execute(f"CREATE TABLE {table} ({col_list})")
            con.executemany(f"INSERT INTO {table} VALUES ({placeholders})", rows)
        con.commit()
    finally:
        con.close()
        ddb.close()
    os.replace(tmp, path)
    return path


# array columns exercised through the remote fetch (reference README
# supported-type matrix: Int4[]/Float8[]/Text[]; schema.rs *Array types)
_ARRAY_TYPES_SQL = """
    SELECT n_nationkey,
           [n_nationkey, n_regionkey, n_nationkey + n_regionkey] AS int_arr,
           [CAST(n_nationkey AS DOUBLE) / 2, CAST(n_regionkey AS DOUBLE)] AS dbl_arr,
           [n_name, 'tail'] AS str_arr
    FROM {nation}
"""


# the reference README's supported-type matrix beyond ints/floats/text:
# DECIMAL, DATE, TIMESTAMP, BOOLEAN, BLOB, JSON — derived deterministically
# from orders so the DuckDB oracle can rebuild identical values from the
# parquet view with the same expressions
_WIDE_TYPES_SQL = """
    SELECT o_orderkey,
           CAST(o_totalprice AS DECIMAL(12,2)) AS dec_col,
           DATE '1995-01-01' + CAST(o_orderkey % 1000 AS INT) AS date_col,
           TIMESTAMP '1995-01-01 00:00:00' + INTERVAL 1 HOUR * CAST(o_orderkey % 240 AS INT) AS ts_col,
           (o_orderkey % 2 = 0) AS bool_col,
           CAST(o_orderstatus AS BLOB) AS blob_col,
           '{{"priority": "' || o_orderpriority || '"}}' AS json_col
    FROM {orders}
    WHERE o_orderkey % 97 = 0
"""


def ensure_duckdb_remote(sf_dir: str) -> str:
    """A second, different remote backend (analytical) for multi-source
    federation: nation+region live here, plus array- and wide-typed
    tables."""
    import duckdb

    path = _cache_path(sf_dir, ".duckdb", spec=f"duckdb-v4|{_ARRAY_TYPES_SQL}|{_WIDE_TYPES_SQL}")
    if os.path.exists(path):
        return path
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    con = duckdb.connect(tmp)
    try:
        for table in ("nation", "region"):
            con.execute(
                f"CREATE TABLE {table} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, table)}.parquet')"
            )
        # the analytical warehouse holds the ODD half of orders (the
        # sqlite OLTP holds all of them; federated_partial_agg reads the
        # even half there) — a sharded-fact federation scenario
        con.execute(
            "CREATE TABLE orders AS SELECT o_orderkey, o_custkey, o_orderstatus, "
            "o_totalprice, o_orderpriority FROM read_parquet('"
            + os.path.join(sf_dir, "orders") + ".parquet') WHERE o_orderkey % 2 = 1"
        )
        con.execute(
            "CREATE TABLE array_types AS "
            + _ARRAY_TYPES_SQL.format(nation=f"read_parquet('{os.path.join(sf_dir, 'nation')}.parquet')")
        )
        con.execute(
            "CREATE TABLE wide_types AS "
            + _WIDE_TYPES_SQL.format(orders=f"read_parquet('{os.path.join(sf_dir, 'orders')}.parquet')")
        )
    finally:
        con.close()
    os.replace(tmp, path)
    return path


def _sqlite_opts(sf_dir: str) -> SqliteConnectionOptions:
    return SqliteConnectionOptions(path=ensure_sqlite_remote(sf_dir))


# --------------------------------------------------------------------------
@register(
    "remote_table_scan",
    oracle="""
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier WHERE s_acctbal > 5000.0
    """,
)
def remote_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RemoteSource::Table scan + Catalyst filter pushed to remote SQL."""
    t = RemoteTable(_sqlite_opts(sf_dir), ["supplier"])
    df = t.read(spark)
    return df.filter(F.col("s_acctbal") > 5000.0).select(
        "s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("s_acctbal")
    )


@register(
    "remote_query_scan",
    oracle="""
    SELECT CAST(n.n_nationkey AS BIGINT) AS n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def remote_query_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RemoteSource::Query — the join itself runs on the remote DB."""
    t = RemoteTable(
        _sqlite_opts(sf_dir),
        "SELECT n.n_nationkey, n.n_name, r.r_name FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey",
    )
    return t.read(spark)


@register(
    "remote_filter_pushdown",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 0.0
    """,
)
def remote_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both predicates unparse to sqlite SQL and run remotely; Spark's scan
    sees only matching rows (transform.rs unparse_filter parity)."""
    t = RemoteTable(_sqlite_opts(sf_dir), ["customer"])
    return (
        t.read(spark)
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") < 0.0))
        .select("c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("c_acctbal"))
    )


@register(
    "remote_limit_pushdown",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name
    FROM customer ORDER BY c_custkey LIMIT 10
    """,
)
def remote_limit_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT composed into the remote SQL (scan.rs limit parity); ORDER BY
    on the remote side keeps the result deterministic."""
    t = RemoteTable(_sqlite_opts(sf_dir), "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey")
    return t.read(spark, limit=10)


@register(
    "remote_projection_pushdown",
    oracle="SELECT n_name, CAST(n_nationkey AS BIGINT) AS n_nationkey FROM nation",
)
def remote_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Only the two requested columns appear in the remote SELECT list."""
    t = RemoteTable(_sqlite_opts(sf_dir), ["nation"])
    return t.read(spark, columns=["n_name", "n_nationkey"])


@register("remote_count_pushdown", oracle="SELECT COUNT(*) AS n_rows FROM orders")
def remote_count_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(*) evaluated wholly on the remote DB (count1_agg parity)."""
    n = RemoteTable(_sqlite_opts(sf_dir), ["orders"]).count()
    return local_frame(spark, [(n,)], "n_rows bigint")


@register(
    "remote_schema_inference",
    oracle="""
    SELECT * FROM (VALUES
      ('s_suppkey', 'bigint'), ('s_name', 'string'),
      ('s_nationkey', 'bigint'), ('s_acctbal', 'double')
    ) AS t(col_name, spark_type)
    """,
)
def remote_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inferred remote schema pinned against the schema.rs sqlite mapping
    (INTEGER→bigint, REAL→double, TEXT→string)."""
    t = RemoteTable(_sqlite_opts(sf_dir), ["supplier"])
    return local_frame(spark, t.remote_schema(), "col_name string, spark_type string")


@register(
    "remote_user_schema",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
           CAST(n_regionkey AS BIGINT) AS n_regionkey
    FROM nation
    """,
)
def remote_user_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-specified remote schema (try_new_with_remote_schema parity)."""
    t = RemoteTable(
        _sqlite_opts(sf_dir),
        ["nation"],
        schema=[("n_nationkey", "INTEGER"), ("n_name", "VARCHAR(25)"), ("n_regionkey", "INTEGER")],
    )
    return t.read(spark)


@register(
    "remote_transform",
    oracle="""
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, UPPER(s_name) AS s_name,
           CASE WHEN s_acctbal >= 0 THEN 'credit' ELSE 'debit' END AS acct_band
    FROM supplier
    """,
)
def remote_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch transform hook between remote scan and downstream plan
    (transform.rs parity, via mapInPandas)."""

    def hook(pdf):
        out = pdf[["s_suppkey"]].copy()
        out["s_name"] = pdf["s_name"].str.upper()
        out["acct_band"] = (pdf["s_acctbal"] >= 0).map({True: "credit", False: "debit"})
        return out

    tr = RemoteTransform(hook, "s_suppkey bigint, s_name string, acct_band string")
    t = RemoteTable(_sqlite_opts(sf_dir), ["supplier"], transform=tr)
    return t.read(spark)


@register(
    "remote_insert",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def remote_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a Spark aggregate back into the remote DB (insert.rs parity),
    then read it back through the remote scan."""
    opts = _sqlite_opts(sf_dir)
    conn = sqlite3.connect(opts.path)
    conn.execute("CREATE TABLE IF NOT EXISTS priority_rollup (o_orderpriority TEXT, n_orders INTEGER)")
    conn.commit()
    conn.close()
    dfs = load_tables(spark, sf_dir, ("orders",))
    agg = dfs["orders"].groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))
    t = RemoteTable(opts, ["priority_rollup"])
    t.insert(agg, mode="overwrite")
    return t.read(spark)


@register(
    "remote_join_local",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def remote_join_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federation: remote dimension broadcast-joined to local parquet fact —
    the core use-case of the reference (remote provider inside local SQL)."""
    nation = RemoteTable(_sqlite_opts(sf_dir), ["nation"]).read(spark)
    customer = load_tables(spark, sf_dir, ("customer",))["customer"]
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
    )


@register(
    "federated_multi_source",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_suppliers
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def federated_multi_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two different remote engines (sqlite OLTP + duckdb analytical) joined
    in one Spark plan — the multi-provider federation story."""
    supplier = RemoteTable(_sqlite_opts(sf_dir), ["supplier"]).read(spark)
    ddb = DuckdbConnectionOptions(path=ensure_duckdb_remote(sf_dir))
    nr = RemoteTable(
        ddb,
        "SELECT n.n_nationkey, r.r_name FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey",
    ).read(spark)
    return (
        supplier.join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


@register(
    "remote_scan_serde",
    oracle="""
    SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region
    """,
)
def remote_scan_serde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan spec → JSON → rebuilt → executed (codec.rs serialization
    parity: the plan survives a driver→executor round trip)."""
    spec = RemoteScanSpec(options=_sqlite_opts(sf_dir), table=["region"])
    rebuilt = RemoteScanSpec.from_json(spec.to_json())
    t = RemoteTable(rebuilt.options, rebuilt.table)
    return t.read(spark)


@register(
    "remote_partitioned_read",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def remote_partitioned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel range-partitioned remote fetch (8 disjoint o_orderkey
    ranges, one executor task each) — the 100TB scan shape; the aggregate
    proves the ranges are complete and disjoint."""
    t = RemoteTable(_sqlite_opts(sf_dir), ["orders"])
    df = t.read(spark, partition_column="o_orderkey", fetch_partitions=8)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


@register(
    "remote_array_types",
    oracle="""
    WITH a AS (
      SELECT n_nationkey,
             [n_nationkey, n_regionkey, n_nationkey + n_regionkey] AS int_arr,
             [CAST(n_nationkey AS DOUBLE) / 2, CAST(n_regionkey AS DOUBLE)] AS dbl_arr,
             [n_name, 'tail'] AS str_arr
      FROM nation
    )
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
           CAST(len(int_arr) AS INT) AS n_ints,
           CAST(int_arr[3] AS BIGINT) AS int_last,
           ROUND(COALESCE(list_sum(dbl_arr), 0.0), 6) AS dbl_sum,
           array_to_string(str_arr, ',') AS str_joined
    FROM a
    """,
)
def remote_array_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed columns (INT[]/DOUBLE[]/VARCHAR[]) fetched through the
    remote DataSource as Arrow list arrays, then operated on Spark-side —
    proves the array fetch path end-to-end (reference README type matrix:
    Int4[]/Float8[]/Text[]; schema.rs *Array mappings)."""
    ddb = DuckdbConnectionOptions(path=ensure_duckdb_remote(sf_dir))
    df = RemoteTable(ddb, ["array_types"]).read(spark)
    return df.select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        F.size("int_arr").alias("n_ints"),
        F.element_at("int_arr", 3).cast("bigint").alias("int_last"),
        F.round(
            F.aggregate("dbl_arr", F.lit(0.0), lambda acc, v: acc + v), 6
        ).alias("dbl_sum"),
        F.array_join("str_arr", ",").alias("str_joined"),
    )


@register(
    "remote_stream_scan",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def remote_stream_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming remote source (remote/stream_datasource.py): tail the
    remote orders table by o_orderkey with availableNow, aggregate the
    stream; on bounded input this converges to the batch answer — the
    streaming twin of the reference's chunked remote result streams."""
    import tempfile

    from ..remote.stream_datasource import RemoteTableStreamDataSource
    from ..session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    spark.dataSource.register(RemoteTableStreamDataSource)
    opts = _sqlite_opts(sf_dir)
    spec = RemoteScanSpec(options=opts, table=["orders"])
    stream = (
        spark.readStream.format("remote_table_stream")
        .schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderpriority string"
        )
        .option("spec", spec.to_json())
        .option("key_column", "o_orderkey")
        .load()
    )
    agg = stream.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_orders"))
    ckpt = tempfile.mkdtemp(prefix="dfrt_rstream_")
    q = (
        agg.writeStream.format("memory")
        .queryName("remote_stream_scan_result")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("remote_stream_scan_result")


@register(
    "remote_agg_pushdown",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS total_price
    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
    """,
)
def remote_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pushdown: the GROUP BY runs on the remote DB and
    Spark receives one row per group — the grouped generalization of the
    reference's count(1) rewrite (postgres.rs count1_agg; DataFusion's
    federation layer does the same SQL rewrite). Money sums travel as
    integer cents so both engines aggregate exactly."""
    t = RemoteTable(_sqlite_opts(sf_dir), ["orders"])
    df = t.aggregate(
        spark,
        group_by=["o_orderpriority"],
        aggs=[
            ("COUNT(*)", "n_orders"),
            ("SUM(CAST(ROUND(o_totalprice * 100) AS INTEGER))", "total_cents"),
        ],
        filters=("o_orderstatus = 'F'",),
        schema="o_orderpriority string, n_orders bigint, total_cents bigint",
    )
    return df.select(
        "o_orderpriority",
        "n_orders",
        (F.col("total_cents") / F.lit(100.0)).alias("total_price"),
    )


@register(
    "remote_topk_pushdown",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 15
    """,
)
def remote_topk_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT (top-k) pushdown: the remote engine sorts and
    truncates to 15 rows (unique-key tie-break on c_custkey); Spark never
    sees the other ~99.9% of the table — at 100 TB this is the difference
    between shipping k rows and shipping the table."""
    t = RemoteTable(_sqlite_opts(sf_dir), ["customer"])
    return t.topk(
        spark,
        order_by=[("c_acctbal", "DESC"), ("c_custkey", "ASC")],
        k=15,
        columns=["c_custkey", "c_name", "c_acctbal"],
    )


@register(
    "remote_join_pushdown",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def remote_join_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-source join pushdown, stacked with aggregate pushdown: both
    tables live in the one remote DB, so join AND group-by run there and
    Spark receives five rows. join_remote returns a RemoteTable, so the
    pushdown ladder (filters/topk/aggregate) composes on the joined
    source exactly like on a base table."""
    opts = _sqlite_opts(sf_dir)
    joined = RemoteTable(opts, ["orders"]).join_remote(
        RemoteTable(opts, ["customer"]),
        on=[("o_custkey", "c_custkey")],
        left_cols=["o_orderkey", "o_totalprice"],
        right_cols=["c_mktsegment"],
    )
    df = joined.aggregate(
        spark,
        group_by=["c_mktsegment"],
        aggs=[
            ("COUNT(*)", "n_orders"),
            ("SUM(CAST(ROUND(o_totalprice * 100) AS INTEGER))", "total_cents"),
        ],
        schema="c_mktsegment string, n_orders bigint, total_cents bigint",
    )
    return df.select(
        "c_mktsegment",
        "n_orders",
        (F.col("total_cents") / F.lit(100.0)).alias("total_price"),
    )


@register(
    "remote_command_list_tables",
    oracle="""
    SELECT backend, table_name FROM (
      VALUES ('sqlite', 'customer'), ('sqlite', 'nation'), ('sqlite', 'orders'),
             ('sqlite', 'region'), ('sqlite', 'supplier'),
             ('duckdb', 'array_types'), ('duckdb', 'nation'), ('duckdb', 'region')
    ) AS t(backend, table_name)
    """,
)
def remote_command_list_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RemoteSource::Command parity (table.rs:21-24 SourceCommand::
    ListMdbTables, generalized per backend): list the user tables of both
    live remote DBs through the connector's metadata command. Output is
    catalog metadata (a handful of rows) — driver-side by nature.

    The listing is intersected with each DB's mirrored base tables so the
    result is deterministic regardless of whether the remote_insert query
    (which creates a scratch table in the shared sqlite file) ran first."""
    base_sqlite = set(_SQLITE_TABLES)
    base_duckdb = {"array_types", "nation", "region"}
    rows = [
        ("sqlite", t)
        for t in RemoteTable.list_tables(_sqlite_opts(sf_dir))
        if t in base_sqlite
    ] + [
        ("duckdb", t)
        for t in RemoteTable.list_tables(
            DuckdbConnectionOptions(path=ensure_duckdb_remote(sf_dir))
        )
        if t in base_duckdb
    ]
    return local_frame(spark, rows, "backend string, table_name string")


@register(
    "remote_wide_types",
    oracle="""
    WITH w AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(12,2)) AS dec_col,
             DATE '1995-01-01' + CAST(o_orderkey % 1000 AS INT) AS date_col,
             TIMESTAMP '1995-01-01 00:00:00' + INTERVAL 1 HOUR * CAST(o_orderkey % 240 AS INT) AS ts_col,
             (o_orderkey % 2 = 0) AS bool_col,
             CAST(o_orderstatus AS BLOB) AS blob_col,
             '{"priority": "' || o_orderpriority || '"}' AS json_col
      FROM orders
      WHERE o_orderkey % 97 = 0
    )
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(dec_col AS DOUBLE) AS dec_dbl,
           strftime(date_col, '%Y-%m-%d') AS date_str,
           strftime(ts_col, '%Y-%m-%d %H:%M:%S') AS ts_str,
           bool_col,
           md5(decode(blob_col)) AS blob_md5,
           json_extract_string(json_col, '$.priority') AS priority
    FROM w
    """,
)
def remote_wide_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference README's supported-type matrix beyond
    ints/floats/text, end-to-end through the remote fetch: DECIMAL,
    DATE, TIMESTAMP, BOOLEAN, BLOB, and JSON-shaped text columns arrive
    as Arrow decimal128/date32/timestamp/bool/binary/utf8 and are
    operated on Spark-side (decimal cast, date/ts formatting, binary
    md5, get_json_object). Parity: schema.rs RemoteType mappings +
    integration-tests supported_*_types."""
    from ..session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    ddb = DuckdbConnectionOptions(path=ensure_duckdb_remote(sf_dir))
    df = RemoteTable(ddb, ["wide_types"]).read(spark)
    return df.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("dec_col").cast("double").alias("dec_dbl"),
        F.date_format("date_col", "yyyy-MM-dd").alias("date_str"),
        F.date_format("ts_col", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "bool_col",
        F.md5("blob_col").alias("blob_md5"),
        F.get_json_object("json_col", "$.priority").alias("priority"),
    )


@register(
    "remote_filter_mixed_pushdown",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_name LIKE 'Customer#00000%'
      AND c_acctbal IS NOT NULL
      AND CAST(c_custkey AS BIGINT) % 3 = 0
    """,
)
def remote_filter_mixed_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact/unsupported pushdown split end-to-end (transform.rs
    support_filter_pushdown parity): IN-list, prefix LIKE, and IS NOT
    NULL unparse into the remote sqlite SQL; the modulo predicate has no
    DataSource filter representation, so Spark keeps it local — pushdown
    as an optimization, never a correctness dependency."""
    t = RemoteTable(_sqlite_opts(sf_dir), ["customer"])
    return (
        t.read(spark)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .filter(F.col("c_name").startswith("Customer#00000"))
        .filter(F.col("c_acctbal").isNotNull())
        .filter((F.col("c_custkey") % 3) == 0)
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "remote_command_table_schema",
    oracle="""
    SELECT backend, table_name, column_name, CAST(position AS BIGINT) AS position
    FROM (
      VALUES ('sqlite', 'supplier', 's_suppkey', 0),
             ('sqlite', 'supplier', 's_name', 1),
             ('sqlite', 'supplier', 's_nationkey', 2),
             ('sqlite', 'supplier', 's_acctbal', 3),
             ('duckdb', 'nation', 'n_nationkey', 0),
             ('duckdb', 'nation', 'n_name', 1),
             ('duckdb', 'nation', 'n_regionkey', 2)
    ) AS t(backend, table_name, column_name, position)
    """,
)
def remote_command_table_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-metadata command (completing the `SourceCommand` surface
    next to remote_command_list_tables): the ordered column list of a
    table in each live remote backend, fetched through the connector's
    catalog — what a user browses before registering a scan. Catalog
    metadata is a handful of rows, driver-side by nature."""
    rows = [
        ("sqlite", "supplier", name, pos)
        for name, pos in RemoteTable.list_columns(_sqlite_opts(sf_dir), "supplier")
    ] + [
        ("duckdb", "nation", name, pos)
        for name, pos in RemoteTable.list_columns(
            DuckdbConnectionOptions(path=ensure_duckdb_remote(sf_dir)), "nation"
        )
    ]
    return local_frame(
        spark,
        rows, "backend string, table_name string, column_name string, position bigint"
    )


# -- live server backend (postgres over the pgwire fallback driver) ----------
_PG_LIVE: dict = {}


def _ensure_postgres_remote(sf_dir: str):
    """Session-lifetime LIVE PostgreSQL mirror of nation/region (25 + 5
    rows, loaded once through the pgwire driver). The server is a
    throwaway trust-auth cluster on a private port (remote/pglocal.py);
    returns its options, or None when the sandbox cannot run a server —
    never raises (callers fall back to the sqlite stand-in, keeping the
    query's RESULT identical either way)."""
    key = os.path.abspath(sf_dir)
    if key in _PG_LIVE:
        return _PG_LIVE[key]
    opts = None
    try:
        from ..remote.pglocal import start_local_postgres

        started = start_local_postgres("dfrt_pgq_")
        if started is not None:
            import atexit

            import duckdb

            from ..remote import pgwire

            opts, stop = started
            atexit.register(stop)
            conn = pgwire.connect(opts.host, opts.port, opts.username, "", opts.database)
            cur = conn.cursor()
            ddb = duckdb.connect()
            cur.execute("CREATE TABLE nation (n_nationkey INT, n_name TEXT, n_regionkey INT)")
            cur.executemany(
                "INSERT INTO nation VALUES (%s, %s, %s)",
                ddb.execute(
                    f"SELECT n_nationkey, n_name, n_regionkey FROM "
                    f"read_parquet('{os.path.join(sf_dir, 'nation')}.parquet')"
                ).fetchall(),
            )
            cur.execute("CREATE TABLE region (r_regionkey INT, r_name TEXT)")
            cur.executemany(
                "INSERT INTO region VALUES (%s, %s)",
                ddb.execute(
                    f"SELECT r_regionkey, r_name FROM "
                    f"read_parquet('{os.path.join(sf_dir, 'region')}.parquet')"
                ).fetchall(),
            )
            conn.commit()
            conn.close()
            ddb.close()
    except Exception:
        opts = None
    _PG_LIVE[key] = opts
    return opts


@register(
    "remote_postgres_scan",
    oracle="""
    SELECT CAST(n.n_nationkey AS BIGINT) AS n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE n.n_regionkey < 3
    """,
)
def remote_postgres_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE server-backend scan: nation is served by a real PostgreSQL
    (executor tasks fetch over the v3 wire protocol via remote/pgwire.py,
    with the n_regionkey filter pushed into the remote SQL), then joined
    to the local region parquet — the federated OLTP-dim pattern against
    an actual server instead of a file stand-in. Sandboxes that cannot
    boot a server (no binaries / no postgres user) fall back to the
    sqlite mirror; the SQL surface and result are identical, and
    tests/test_remote_postgres_live.py pins the live path."""
    opts = _ensure_postgres_remote(sf_dir)
    if opts is None:
        opts = _sqlite_opts(sf_dir)
    df = RemoteTable(opts, ["nation"]).read(spark).filter(F.col("n_regionkey") < 3)
    region = load_tables(spark, sf_dir, ("region",))["region"]
    return df.join(region, df.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"), "n_name", "r_name"
    )


@register(
    "remote_predicate_pushdown",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           o_orderstatus, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice BETWEEN 1000 AND 50000)
       OR (o_orderpriority LIKE '1-%' AND o_totalprice > 150000)
    """,
)
def remote_predicate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit predicate pushdown (the transform.rs:52-86 parity gap):
    a q19-style OR-of-conjunctions with BETWEEN and LIKE cannot reach the
    remote through Catalyst's atomic-conjunct filter API, so
    ``RemoteTable.read(predicate=...)`` parses/validates it and composes
    it into the remote SQL — the WHOLE disjunction runs on the remote DB
    and Spark streams only matching rows (at 100TB of remote fact data
    this is the difference between shipping the table and shipping the
    answer)."""
    t = RemoteTable(_sqlite_opts(sf_dir), ["orders"])
    df = t.read(
        spark,
        predicate=(
            "(o_orderstatus = 'F' AND o_totalprice BETWEEN 1000 AND 50000) "
            "OR (o_orderpriority LIKE '1-%' AND o_totalprice > 150000)"
        ),
    )
    return df.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )


@register(
    "remote_insert_select",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 200000 OR (o_orderstatus = 'P' AND o_totalprice BETWEEN 50000 AND 100000)
    """,
)
def remote_insert_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side pushdown (ELT composition): INSERT INTO … SELECT runs
    ENTIRELY on the remote DB — the disjunctive filter goes through the
    predicate parse/validate/render path and the rows never cross the
    wire until the final federated read-back. The reference's insert.rs
    always streams rows through the engine; at 100TB of remote fact
    data, pushing the transform to the data is the difference between
    an ELT statement and a two-way bulk transfer."""
    path = ensure_sqlite_remote(sf_dir)
    con = sqlite3.connect(path)
    try:
        con.execute("DROP TABLE IF EXISTS big_orders")
        con.execute(
            "CREATE TABLE big_orders (o_orderkey, o_orderstatus, o_totalprice)"
        )
        con.commit()
    finally:
        con.close()
    t = RemoteTable(_sqlite_opts(sf_dir), ["big_orders"])
    t.insert_select(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
        predicate=(
            "o_totalprice > 200000 "
            "OR (o_orderstatus = 'P' AND o_totalprice BETWEEN 50000 AND 100000)"
        ),
    )
    return t.read(spark).select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )


def _copy_orders_table(sf_dir: str, name: str) -> None:
    path = ensure_sqlite_remote(sf_dir)
    con = sqlite3.connect(path)
    try:
        con.execute(f"DROP TABLE IF EXISTS {name}")
        con.execute(f"CREATE TABLE {name} AS SELECT * FROM orders")
        con.commit()
    finally:
        con.close()


@register(
    "remote_delete_pushdown",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE NOT (o_orderstatus = 'F' OR o_totalprice < 50000)
    """,
)
def remote_delete_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side DELETE pushdown: the disjunctive predicate is parsed,
    validated against the remote schema, rendered in the remote dialect,
    and the DELETE runs entirely on the remote DB — retention/GDPR-style
    purges never pull rows through the engine. Runs on a private copy
    table so the shared stand-in DB stays pristine."""
    _copy_orders_table(sf_dir, "orders_delpush")
    t = RemoteTable(_sqlite_opts(sf_dir), ["orders_delpush"])
    t.delete_where("o_orderstatus = 'F' OR o_totalprice < 50000")
    return t.read(spark).select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )


@register(
    "remote_update_pushdown",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority,
           CAST(CASE WHEN o_orderpriority LIKE '1-%'
                     THEN o_totalprice * 1.1e0 + 5
                     ELSE o_totalprice END AS DOUBLE) AS o_totalprice
    FROM orders
    """,
)
def remote_update_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side UPDATE pushdown: the SET expression (arithmetic over
    remote columns) and the WHERE predicate both go through the parse/
    validate/render path — the repricing runs where the data lives.
    Float math is IEEE on both sides (the expression renders 1.1 as
    1.1e0, forcing DOUBLE in every dialect)."""
    _copy_orders_table(sf_dir, "orders_updpush")
    t = RemoteTable(_sqlite_opts(sf_dir), ["orders_updpush"])
    t.update_where(
        {"o_totalprice": "o_totalprice * 1.1 + 5"},
        predicate="o_orderpriority LIKE '1-%'",
    )
    return t.read(spark).select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )


@register(
    "remote_schema_drift_audit",
    oracle="""
    SELECT * FROM (VALUES
      ('o_custkey',      'ok'),
      ('o_orderkey',     'ok'),
      ('o_orderstatus',  'ok'),
      ('o_totalprice',   'ok'),
      ('o_comment',      'missing_remote'),
      ('o_orderpriority','unexpected_remote')
    ) AS t(col_name, status) ORDER BY status, col_name
    """,
)
def remote_schema_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federation DQ: diff the remote table's LIVE catalog columns
    (list_columns — the SourceCommand surface) against the contract the
    pipeline expects. The audit that catches a remote DBA adding or
    dropping a column before a scheduled scan silently breaks. The
    expected list here deliberately includes a column the remote lacks
    (o_comment) and omits one it has (o_orderpriority) so both drift
    classes appear."""
    ensure_sqlite_remote(sf_dir)
    expected = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_comment"]
    remote = [c for c, _pos in RemoteTable.list_columns(_sqlite_opts(sf_dir), "orders")]
    rows = [(c, "ok" if c in remote else "missing_remote") for c in expected]
    rows += [(c, "unexpected_remote") for c in remote if c not in expected]
    df = local_frame(spark, rows, "col_name string, status string")
    return df.orderBy("status", "col_name")


@register(
    "remote_partition_balance_audit",
    oracle="""
    WITH bounds AS (
      SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) + 1 AS hi FROM orders
    ),
    params AS (
      SELECT lo, hi, GREATEST(1, (hi - lo + 7) // 8) AS step FROM bounds
    ),
    assigned AS (
      SELECT (o.o_orderkey - p.lo) // p.step AS range_id
      FROM orders o CROSS JOIN params p
    ),
    loads AS (
      SELECT range_id, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM assigned GROUP BY range_id
    ),
    nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_rows) AS BIGINT) AS total FROM loads)
    SELECT CAST(l.range_id AS BIGINT) AS range_id, l.n_rows,
           ROUND(CAST(l.n_rows AS DOUBLE) / nr.total, 6) AS row_share,
           ROUND(CAST(l.n_rows AS DOUBLE) * nr.k / nr.total, 4) AS skew_vs_ideal
    FROM loads l CROSS JOIN nr
    ORDER BY range_id
    """,
)
def remote_partition_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-fetch skew audit: plan the 8-way key-range split the
    partitioned remote read uses (spec.partition_predicates — MIN/MAX
    probe + half-open ranges), then push a COUNT per range to the
    remote and report per-range load vs ideal. The pre-flight check
    before fanning 1000 executor tasks at a remote table whose keyspace
    might be lumpy. All work runs remotely; only 8 counts return."""
    from ..remote.connection import connect

    ensure_sqlite_remote(sf_dir)
    spec = RemoteScanSpec(
        options=_sqlite_opts(sf_dir),
        table=["orders"],
        partition_column="o_orderkey",
        fetch_partitions=8,
    )
    preds = spec.partition_predicates()
    conn = connect(spec.options)
    try:
        cur = conn.cursor()
        counts = []
        for i, pred in enumerate(preds):
            sql = spec.dialect.compose(spec.table, filters=pred)
            cur.execute(f"SELECT COUNT(*) FROM ({sql}) t")
            counts.append((i, int(cur.fetchone()[0])))
    finally:
        conn.close()
    total = sum(n for _, n in counts) or 1
    k = len(counts)
    rows = [
        (i, n, round(n / total, 6), round(n * k / total, 4)) for i, n in counts
    ]
    return local_frame(
        spark,
        rows, "range_id bigint, n_rows bigint, row_share double, skew_vs_ideal double"
    )


@register(
    "federated_partial_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
                AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def federated_partial_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase FEDERATED aggregation: each remote engine computes its
    shard's partial GROUP BY locally (the grouped-aggregate pushdown —
    only group-grain rows cross the wire), and Spark combines the
    partials — the map-side-combine pattern lifted to the federation
    layer. The sqlite OLTP serves the even orderkeys, the duckdb
    warehouse the odd ones; money moves as exact integer cents so the
    combine is order-independent."""
    even = RemoteTable(_sqlite_opts(sf_dir), ["orders"]).aggregate(
        spark,
        group_by=["o_orderstatus"],
        aggs=[
            ("COUNT(*)", "n"),
            ("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS INTEGER)) AS INTEGER)", "cents"),
        ],
        filters=("o_orderkey % 2 = 0",),
        schema="o_orderstatus string, n long, cents long",
    )
    ddb = DuckdbConnectionOptions(path=ensure_duckdb_remote(sf_dir))
    odd = RemoteTable(ddb, ["orders"]).aggregate(
        spark,
        group_by=["o_orderstatus"],
        aggs=[
            ("COUNT(*)", "n"),
            ("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)", "cents"),
        ],
        schema="o_orderstatus string, n long, cents long",
    )
    return (
        even.union(odd)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n").cast("bigint").alias("n_orders"),
            (F.sum("cents").cast("double") / F.lit(100)).cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "remote_incremental_sync",
    oracle="""
    WITH mx AS (SELECT CAST(MAX(o_orderkey) AS BIGINT) AS mk FROM orders),
    legs AS (
      -- each leg reads mk via scalar subqueries and has no GROUP BY, so
      -- an EMPTY key-range batch still emits its one ledger row with
      -- rows_pulled = 0 (matching the Spark side's global aggregate,
      -- which always produces a row) instead of vanishing.
      SELECT CAST(0 AS INT) AS batch_id,
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderkey <= (SELECT mk FROM mx) // 3) AS BIGINT)
               AS rows_pulled,
             CAST((SELECT mk FROM mx) // 3 AS BIGINT) AS watermark_key
      UNION ALL
      SELECT CAST(1 AS INT),
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderkey > (SELECT mk FROM mx) // 3
                     AND o_orderkey <= (2 * (SELECT mk FROM mx)) // 3) AS BIGINT),
             CAST((2 * (SELECT mk FROM mx)) // 3 AS BIGINT)
      UNION ALL
      SELECT CAST(2 AS INT),
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderkey > (2 * (SELECT mk FROM mx)) // 3) AS BIGINT),
             CAST((SELECT mk FROM mx) AS BIGINT)
    )
    SELECT batch_id, rows_pulled, watermark_key,
           CAST(SUM(rows_pulled) OVER (ORDER BY batch_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_rows
    FROM legs
    ORDER BY batch_id
    """,
)
def remote_incremental_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark incremental sync (the CDC-pull loop every
    federation deployment runs on top of a remote table): an initial
    snapshot then two catch-up batches, each pulled with the key-range
    predicate PUSHED to the remote DB (only the delta crosses the wire)
    and the watermark advanced to the batch's max key. The report is
    the per-batch pull ledger with the cumulative row count — the sync
    bookkeeping a platform audits before trusting an incremental
    pipeline. Scale: each batch is a remote range scan (the reference's
    partitioned-read shape); the ledger is 3 aggregate rows; the
    watermark is a scalar pushdown aggregate, never a data-scale
    collect."""
    t = RemoteTable(_sqlite_opts(sf_dir), ["orders"])
    mk = int(t.read(spark).agg(F.max("o_orderkey")).collect()[0][0])
    w1, w2 = mk // 3, (2 * mk) // 3

    def leg(batch_id: int, predicate: str, watermark: int) -> DataFrame:
        return (
            t.read(spark, predicate=predicate)
            .agg(F.count(F.lit(1)).cast("bigint").alias("rows_pulled"))
            .select(
                F.lit(batch_id).cast("int").alias("batch_id"),
                F.col("rows_pulled"),
                F.lit(watermark).cast("bigint").alias("watermark_key"),
            )
        )

    from pyspark.sql import Window

    legs = (
        leg(0, f"o_orderkey <= {w1}", w1)
        .union(leg(1, f"o_orderkey > {w1} AND o_orderkey <= {w2}", w2))
        .union(leg(2, f"o_orderkey > {w2}", mk))
    )
    w = Window.orderBy("batch_id").rowsBetween(Window.unboundedPreceding, 0)
    return legs.withColumn(
        "cumulative_rows", F.sum("rows_pulled").over(w).cast("bigint")
    ).orderBy("batch_id")


_RECON_REMOTE_SQL = """
    SELECT o_orderkey % 8 AS chunk_id,
           COUNT(*) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
    FROM orders GROUP BY o_orderkey % 8
"""


@register(
    "remote_checksum_reconcile",
    oracle="""
    WITH full_side AS (
      SELECT o_orderkey % 8 AS chunk_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
      FROM orders GROUP BY o_orderkey % 8
    ),
    odd_side AS (
      SELECT o_orderkey % 8 AS chunk_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
      FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_orderkey % 8
    )
    SELECT CAST(COALESCE(f.chunk_id, o.chunk_id) AS BIGINT) AS chunk_id,
           CAST(COALESCE(f.n_rows, 0) AS BIGINT) AS rows_primary,
           CAST(COALESCE(o.n_rows, 0) AS BIGINT) AS rows_replica,
           CAST(COALESCE(f.key_sum, 0) AS BIGINT) AS key_sum_primary,
           CAST(COALESCE(o.key_sum, 0) AS BIGINT) AS key_sum_replica,
           CAST(COALESCE(f.cents_sum, 0) AS BIGINT) AS cents_sum_primary,
           CAST(COALESCE(o.cents_sum, 0) AS BIGINT) AS cents_sum_replica,
           CASE WHEN COALESCE(f.n_rows, 0) = COALESCE(o.n_rows, 0)
                THEN 1 ELSE 0 END AS rows_match,
           CASE WHEN COALESCE(f.key_sum, 0) = COALESCE(o.key_sum, 0)
                 AND COALESCE(f.cents_sum, 0) = COALESCE(o.cents_sum, 0)
                THEN 1 ELSE 0 END AS sums_match
    FROM full_side f FULL OUTER JOIN odd_side o ON o.chunk_id = f.chunk_id
    ORDER BY chunk_id
    """,
)
def remote_checksum_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine table reconciliation by pushed-down control totals
    (the datacompy/data-diff job every federation runs before trusting a
    replica): the same chunked checksum query — per o_orderkey%8 chunk,
    row count plus key and money control totals — executes REMOTELY on
    both engines (sqlite primary holds the full order book, the duckdb
    analytical replica holds only the odd-key shard), and only 8
    aggregate rows per side cross the wire. The full-outer merge flags
    per-chunk row/checksum drift: on this deployment the four even
    chunks genuinely mismatch (the replica is a half-shard), so the
    match flags are a REAL mixture, not a vacuous all-1 column. Scale:
    the reconciliation moves neither table — remote agg pushdown does
    the heavy scan on each engine's side (the reference's
    count/agg-pushdown surface: remote-table/src/transform.rs)."""
    primary = RemoteTable(_sqlite_opts(sf_dir), _RECON_REMOTE_SQL).read(spark)
    replica = RemoteTable(
        DuckdbConnectionOptions(path=ensure_duckdb_remote(sf_dir)),
        _RECON_REMOTE_SQL,
    ).read(spark)
    f, o = primary.alias("f"), replica.alias("o")
    z = F.lit(0).cast("long")
    merged = f.join(o, F.col("f.chunk_id") == F.col("o.chunk_id"), "full_outer")
    return (
        merged.select(
            F.coalesce(F.col("f.chunk_id"), F.col("o.chunk_id"))
            .cast("long").alias("chunk_id"),
            F.coalesce(F.col("f.n_rows").cast("long"), z).alias("rows_primary"),
            F.coalesce(F.col("o.n_rows").cast("long"), z).alias("rows_replica"),
            F.coalesce(F.col("f.key_sum").cast("long"), z).alias("key_sum_primary"),
            F.coalesce(F.col("o.key_sum").cast("long"), z).alias("key_sum_replica"),
            F.coalesce(F.col("f.cents_sum").cast("long"), z).alias("cents_sum_primary"),
            F.coalesce(F.col("o.cents_sum").cast("long"), z).alias("cents_sum_replica"),
        )
        .withColumn(
            "rows_match",
            F.when(F.col("rows_primary") == F.col("rows_replica"), 1).otherwise(0),
        )
        .withColumn(
            "sums_match",
            F.when(
                (F.col("key_sum_primary") == F.col("key_sum_replica"))
                & (F.col("cents_sum_primary") == F.col("cents_sum_replica")),
                1,
            ).otherwise(0),
        )
        .orderBy("chunk_id")
    )


# Row-width estimates (bytes) from the remote schemas — fixed planner
# constants shared with the oracle (key/int 8B, money 8B, short varchar
# averaged): the planner needs relative magnitudes, not exact bytes.
_SHIP_WIDTHS = {"orders": 45, "customer": 48, "nation": 24, "supplier": 36}
# calibrated to the test scales (round-6 non-vacuousness rule): at the
# production default (10MB) every probed side broadcasts at sf<=0.1 and
# the decision column is a constant — 24KB exercises the full three-way
# decision at sf0.01 (orders x orders_odd -> shuffle_both, customer x
# nation -> ship_smaller on the 120x ratio, supplier x nation ->
# broadcast) and two ways at sf0.001
_SHIP_BROADCAST_BYTES = 24 * 1024


def _ship_strategy(bl: int, br: int) -> str:
    if min(bl, br) <= _SHIP_BROADCAST_BYTES:
        return "broadcast_smaller"
    if max(bl, br) <= 10 * min(bl, br):
        return "shuffle_both"
    return "ship_smaller"


@register(
    "federated_ship_plan",
    oracle=f"""
    WITH probes AS (
      SELECT 'orders_x_orders_odd' AS join_name,
             (SELECT COUNT(*) FROM orders) AS rows_left,
             (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 1) AS rows_right,
             {_SHIP_WIDTHS['orders']} AS wl, {_SHIP_WIDTHS['orders']} AS wr
      UNION ALL
      SELECT 'customer_x_nation',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM nation),
             {_SHIP_WIDTHS['customer']}, {_SHIP_WIDTHS['nation']}
      UNION ALL
      SELECT 'supplier_x_nation',
             (SELECT COUNT(*) FROM supplier),
             (SELECT COUNT(*) FROM nation),
             {_SHIP_WIDTHS['supplier']}, {_SHIP_WIDTHS['nation']}
    )
    SELECT join_name,
           CAST(rows_left AS BIGINT) AS rows_left,
           CAST(rows_right AS BIGINT) AS rows_right,
           CAST(rows_left * wl AS BIGINT) AS bytes_left,
           CAST(rows_right * wr AS BIGINT) AS bytes_right,
           CASE WHEN least(rows_left * wl, rows_right * wr)
                     <= {_SHIP_BROADCAST_BYTES} THEN 'broadcast_smaller'
                WHEN greatest(rows_left * wl, rows_right * wr)
                     <= 10 * least(rows_left * wl, rows_right * wr)
                     THEN 'shuffle_both'
                ELSE 'ship_smaller' END AS strategy
    FROM probes
    ORDER BY join_name
    """,
)
def federated_ship_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated join-locality planner (the pre-flight every federation
    optimizer runs before moving data): for each cross-engine join pair,
    probe BOTH remotes with a pushed COUNT (one scalar crosses the wire
    per side — the reference's count-pushdown surface), estimate shipped
    bytes from fixed schema row widths, and pick broadcast-smaller /
    shuffle-both / ship-smaller. The decision table is what a planner
    would feed into remote_join_pushdown vs local-join dispatch. Scale:
    the plan costs three COUNT round trips; no table rows move.
    Determinism: counts are exact; widths are shared constants; the
    strategy thresholds are integer comparisons. Non-vacuous at sf0.01:
    rows/bytes differ per pair (and grow with sf), and the duckdb
    orders replica is a half-shard so the fact-fact pair's sides
    genuinely differ."""
    sq = _sqlite_opts(sf_dir)
    dk = DuckdbConnectionOptions(path=ensure_duckdb_remote(sf_dir))
    probes = [
        ("orders_x_orders_odd",
         RemoteTable(sq, ["orders"]).count(),
         RemoteTable(dk, ["orders"]).count(),
         _SHIP_WIDTHS["orders"], _SHIP_WIDTHS["orders"]),
        ("customer_x_nation",
         RemoteTable(sq, ["customer"]).count(),
         RemoteTable(dk, ["nation"]).count(),
         _SHIP_WIDTHS["customer"], _SHIP_WIDTHS["nation"]),
        ("supplier_x_nation",
         RemoteTable(sq, ["supplier"]).count(),
         RemoteTable(dk, ["nation"]).count(),
         _SHIP_WIDTHS["supplier"], _SHIP_WIDTHS["nation"]),
    ]
    rows = [
        (name, int(rl), int(rr), int(rl) * wl, int(rr) * wr,
         _ship_strategy(rl * wl, rr * wr))
        for name, rl, rr, wl, wr in probes
    ]
    return local_frame(
        spark,
        sorted(rows),
        "join_name string, rows_left long, rows_right long, "
        "bytes_left long, bytes_right long, strategy string",
    )


def _copy_customer_table(sf_dir: str, name: str) -> None:
    path = ensure_sqlite_remote(sf_dir)
    con = sqlite3.connect(path)
    try:
        con.execute(f"DROP TABLE IF EXISTS {name}")
        con.execute(f"CREATE TABLE {name} AS SELECT * FROM customer")
        con.commit()
    finally:
        con.close()


@register(
    "remote_add_column_backfill",
    oracle="""
    SELECT CAST(c_nationkey AS INT) AS c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND((c_acctbal * 2 + 1000) * 100) AS DECIMAL(28, 0)))
                AS DOUBLE) / 100.0e0 AS credit_limit_total
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def remote_add_column_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote SCHEMA EVOLUTION with backfill (the write-side counterpart
    of remote_schema_drift_audit): ALTER TABLE ADD COLUMN plus a
    backfill UPDATE, both composed through the dialect layer and
    executed ON the remote engine — no rows cross the wire to evolve
    the table. The read-back re-infers the schema (the cached schema is
    invalidated by add_column) and aggregates the NEW column per
    nation, so the hash certifies the remote engine actually computed
    the backfill expression. Determinism: the backfill is fixed-order
    IEEE arithmetic over the remote doubles; the audit sums exact
    DECIMAL cents. Scale: DDL + one remote UPDATE; the audit is an agg
    over the evolved table."""
    _copy_customer_table(sf_dir, "customer_evolve")
    t = RemoteTable(_sqlite_opts(sf_dir), ["customer_evolve"])
    t.add_column("credit_limit", "DOUBLE", backfill="c_acctbal * 2 + 1000")
    evolved = t.read(spark)
    return (
        evolved.groupBy(F.col("c_nationkey").cast("int").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            (
                F.sum(
                    F.round(F.col("credit_limit") * 100).cast("decimal(28,0)")
                ).cast("double")
                / F.lit(100.0)
            ).alias("credit_limit_total"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "remote_diff_drilldown",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS missing_key,
           'replica' AS missing_from,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents_primary
    FROM orders
    WHERE o_orderkey % 8 = 0 AND o_orderkey % 2 = 0
    ORDER BY missing_key
    LIMIT 20
    """,
)
def remote_diff_drilldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drill-down step after remote_checksum_reconcile flags a
    chunk: pull ONLY the flagged chunk's keys from both engines (the
    chunk predicate pushes to each remote — a bounded slice crosses the
    wire, never the tables), anti-join to name the keys one side is
    missing, and sample the first 20 with the primary's control value.
    On this deployment chunk 0 is even-key-only and the duckdb replica
    holds the odd shard, so every chunk-0 key is missing from the
    replica — the drill-down names the concrete rows behind the
    checksum mismatch, which is what an operator pastes into the
    incident ticket. Scale: two pushed range scans of ONE chunk + an
    anti-join on keys; the sample is a bounded ORDER BY/LIMIT."""
    primary = RemoteTable(_sqlite_opts(sf_dir), ["orders"]).read(
        spark, predicate="o_orderkey % 8 = 0"
    )
    replica = RemoteTable(
        DuckdbConnectionOptions(path=ensure_duckdb_remote(sf_dir)), ["orders"]
    ).read(spark, predicate="o_orderkey % 8 = 0")
    missing = primary.join(
        replica.select(F.col("o_orderkey").alias("rk")),
        primary.o_orderkey == F.col("rk"),
        "left_anti",
    )
    return (
        missing.select(
            F.col("o_orderkey").cast("long").alias("missing_key"),
            F.lit("replica").alias("missing_from"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents_primary"),
        )
        .orderBy("missing_key")
        .limit(20)
    )


@register(
    "federated_topk_orders",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           CASE WHEN o_orderkey % 2 = 0 THEN 'sqlite' ELSE 'duckdb' END AS shard
    FROM orders
    ORDER BY cents DESC, o_orderkey
    LIMIT 10
    """,
)
def federated_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated two-phase TOP-K (the distributed top-k protocol): each
    shard computes its LOCAL top-k with the ORDER BY/LIMIT pushed to
    the remote engine (sqlite serves the even keys under a pushed
    predicate, the duckdb replica its odd shard), only 2k rows cross
    the wire, and the coordinator merges and re-cuts — provably exact
    because the global top-k is contained in the union of local
    top-ks over a disjoint sharding. This is remote_topk_pushdown
    lifted to the multi-engine case. Determinism: cents are exact
    integers; the cut is a total order on (cents DESC, key). Scale:
    two pushed top-k scans + a 20-row merge."""
    k = 10
    sq = RemoteTable(
        _sqlite_opts(sf_dir),
        f"SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents"
        f" FROM orders WHERE o_orderkey % 2 = 0"
        f" ORDER BY cents DESC, o_orderkey LIMIT {k}",
    ).read(spark).select(
        F.col("o_orderkey").cast("long"), F.col("cents").cast("long"),
        F.lit("sqlite").alias("shard"),
    )
    dk = RemoteTable(
        DuckdbConnectionOptions(path=ensure_duckdb_remote(sf_dir)),
        f"SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents"
        f" FROM orders"
        f" ORDER BY cents DESC, o_orderkey LIMIT {k}",
    ).read(spark).select(
        F.col("o_orderkey").cast("long"), F.col("cents").cast("long"),
        F.lit("duckdb").alias("shard"),
    )
    return (
        sq.union(dk)
        .orderBy(F.col("cents").desc(), F.col("o_orderkey"))
        .limit(k)
    )
