"""DB-API connection factories, import-gated per backend.

Parity: /root/reference/remote-table/src/connection/mod.rs (the
`connect` entry point + per-backend pools). Executor tasks open their
own connection per partition — the Spark analogue of the reference's
connection pool feeding parallel streams.

sqlite (stdlib) and duckdb are always available in this container;
postgres/mysql/oracle factories resolve their drivers lazily so the
module imports cleanly without them (same spirit as the reference's
cargo feature gates).
"""

from __future__ import annotations

from .options import ConnectionOptions


def connect(options: ConnectionOptions):
    backend = options.backend
    if backend == "sqlite":
        import sqlite3

        return sqlite3.connect(options.path)
    if backend == "duckdb":
        import duckdb

        # read_only so N executor tasks can share one database file
        return duckdb.connect(options.path, read_only=True)
    if backend == "postgres":
        try:
            import psycopg2  # type: ignore
        except ImportError as e:
            raise ImportError(
                "postgres backend requires psycopg2 (not bundled in this environment)"
            ) from e
        return psycopg2.connect(
            host=options.host,
            port=options.port,
            user=options.username,
            password=options.password,
            dbname=options.database,
        )
    if backend == "mysql":
        try:
            import pymysql  # type: ignore
        except ImportError as e:
            raise ImportError("mysql backend requires pymysql (not bundled in this environment)") from e
        return pymysql.connect(
            host=options.host,
            port=options.port,
            user=options.username,
            password=options.password,
            database=options.database,
        )
    if backend == "oracle":
        try:
            import oracledb  # type: ignore
        except ImportError as e:
            raise ImportError("oracle backend requires oracledb (not bundled in this environment)") from e
        return oracledb.connect(
            host=options.host,
            port=options.port,
            user=options.username,
            password=options.password,
            service_name=options.service_name,
        )
    if backend == "gaussdb":
        # GaussDB speaks the Postgres wire protocol (reference gaussdb.rs
        # uses a tokio-postgres fork); any Postgres DB-API driver works
        try:
            import psycopg2  # type: ignore
        except ImportError as e:
            raise ImportError(
                "gaussdb backend requires a Postgres driver (psycopg2; not bundled in this environment)"
            ) from e
        return psycopg2.connect(
            host=options.host,
            port=options.port,
            user=options.username,
            password=options.password,
            dbname=options.database,
        )
    if backend == "dm":
        try:
            import dmPython  # type: ignore
        except ImportError as e:
            raise ImportError("dm backend requires dmPython (not bundled in this environment)") from e
        return dmPython.connect(
            host=options.host,
            port=options.port,
            user=options.username,
            password=options.password,
        )
    if backend == "mdb":
        try:
            import pyodbc  # type: ignore
        except ImportError as e:
            raise ImportError(
                "mdb backend requires pyodbc + an Access ODBC driver "
                "(MDBTools; not bundled in this environment)"
            ) from e
        parts = [f"DRIVER={{{options.driver}}}", f"DBQ={options.path}"]
        if options.uid:
            parts.append(f"UID={options.uid}")
        if options.pwd:
            parts.append(f"PWD={options.pwd}")
        # sorted so semantically identical param sets produce the same
        # connection string (mdb/mod.rs cache-key normalization)
        parts += [f"{k}={v}" for k, v in sorted(options.extra_params.items())]
        return pyodbc.connect(";".join(parts))
    raise ValueError(f"unknown backend: {backend}")


def connect_writable(options: ConnectionOptions):
    """Writer-side connection (insert path needs read-write)."""
    if options.backend == "duckdb":
        import duckdb

        return duckdb.connect(options.path, read_only=False)
    if options.backend == "mdb":
        # parity: reference mdb/mod.rs insert() is an explicit error
        raise NotImplementedError("insert is not supported for the mdb backend")
    return connect(options)
