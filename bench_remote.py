"""Remote-engine roundtrip benchmark — the mirror of the reference's
benchmarks/src/bin/postgres.rs: batch-insert N wide typed rows into a
remote table through the federated write path, then stream them all back
through the remote scan, timing both directions.

The reference drives Postgres; this container has no DB servers, so the
live file backends (sqlite, duckdb) stand in — same code path
(DataSource writer / Arrow batch reader), different wire. Prints one
JSON line per backend.

Run: python bench_remote.py [n_rows]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from datafusion_remote_table_spark.remote import (
    DuckdbConnectionOptions,
    RemoteTable,
    SqliteConnectionOptions,
)
from datafusion_remote_table_spark.session import get_spark

LONG_BYTES = b"this is a " + b"o" * 190 + b"g bytes"
LONG_TEXT = "This is a " + "o" * 190 + "g text"
JSON_VAL = '{"key": "value", "key2": [1, 2, 3], "key3": {"nested": "value"}}'


def wide_df(spark, n_rows: int):
    # the reference's 6-column batch: int, float8, bytea, text, json, timestamp
    return spark.range(n_rows).select(
        F.col("id").cast("int").alias("int_col"),
        F.lit(1.23456789).alias("float8_col"),
        F.lit(LONG_BYTES).alias("bytea_col"),
        F.lit(LONG_TEXT).alias("text_col"),
        F.lit(JSON_VAL).alias("json_col"),
        F.lit(dt.datetime(2025, 11, 26, 3, 18, 33)).alias("timestamp_col"),
    )


def _start_postgres():
    """Boot a throwaway PostgreSQL cluster (remote/pglocal.py) and create
    the reference benchmark's table (benchmarks/src/bin/postgres.rs
    create_table_sql, JSON column included) — the LITERAL mirror of the
    reference's postgres benchmark: same table, same batch shapes, a
    real server on the other end of the wire. Returns (options, stop_fn)
    or None when no server can run."""
    from datafusion_remote_table_spark.remote import pgwire
    from datafusion_remote_table_spark.remote.pglocal import start_local_postgres

    started = start_local_postgres("dfrt_bench_pg_")
    if started is None:
        return None
    opts, stop = started
    conn = pgwire.connect(opts.host, opts.port, opts.username, "", opts.database)
    cur = conn.cursor()
    cur.execute(
        "CREATE TABLE bench (int_col INT, float8_col FLOAT8, bytea_col BYTEA,"
        " text_col TEXT, json_col JSON, timestamp_col TIMESTAMP)"
    )
    conn.commit()
    conn.close()
    return opts, stop


def roundtrip(spark, backend: str, n_rows: int) -> dict:
    if backend == "postgres":
        started = _start_postgres()
        if started is None:
            return {"backend": "postgres", "skipped": "no server binaries"}
        opts, stop = started
        try:
            t = RemoteTable(opts, ["bench"])
            df = wide_df(spark, n_rows)
            t0 = time.perf_counter()
            t.insert(df, coalesce=False)  # server backend: parallel writers
            insert_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            scanned = t.read(spark).count()
            scan_s = time.perf_counter() - t0
            assert scanned == n_rows, (scanned, n_rows)
            return {
                "backend": backend,
                "rows": n_rows,
                "insert_sec": round(insert_s, 3),
                "insert_rows_per_sec": round(n_rows / insert_s),
                "scan_sec": round(scan_s, 3),
                "scan_rows_per_sec": round(n_rows / scan_s),
            }
        finally:
            stop()
    work = tempfile.mkdtemp(prefix=f"dfrt_bench_{backend}_")
    path = os.path.join(work, f"bench.{backend}")
    if backend == "sqlite":
        import sqlite3

        con = sqlite3.connect(path)
        con.execute(
            "CREATE TABLE bench (int_col INT, float8_col DOUBLE, bytea_col BLOB,"
            " text_col TEXT, json_col TEXT, timestamp_col TEXT)"
        )
        con.commit()
        con.close()
        opts = SqliteConnectionOptions(path=path)
    else:
        import duckdb

        con = duckdb.connect(path)
        con.execute(
            "CREATE TABLE bench (int_col INT, float8_col DOUBLE, bytea_col BLOB,"
            " text_col TEXT, json_col TEXT, timestamp_col TIMESTAMP)"
        )
        con.close()
        opts = DuckdbConnectionOptions(path=path)

    t = RemoteTable(opts, ["bench"])
    df = wide_df(spark, n_rows)

    t0 = time.perf_counter()
    t.insert(df)
    insert_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    scanned = t.read(spark).count()
    scan_s = time.perf_counter() - t0
    assert scanned == n_rows, (scanned, n_rows)

    return {
        "backend": backend,
        "rows": n_rows,
        "insert_sec": round(insert_s, 3),
        "insert_rows_per_sec": round(n_rows / insert_s),
        "scan_sec": round(scan_s, 3),
        "scan_rows_per_sec": round(n_rows / scan_s),
    }


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("bench_remote")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the write/read path outside timing (JVM + Python workers)
    roundtrip(spark, "sqlite", 1000)
    # postgres runs a SMALLER batch by default: the pure-Python wire
    # driver literalizes row-at-a-time (the psycopg2-less fallback), so
    # the honest number is driver-bound — printed as its own line
    pg_rows = int(os.environ.get("DFRT_BENCH_PG_ROWS", min(n_rows, 100_000)))
    for backend, n in (("sqlite", n_rows), ("duckdb", n_rows), ("postgres", pg_rows)):
        print(json.dumps(roundtrip(spark, backend, n)))


if __name__ == "__main__":
    main()
