"""Streaming remote-table source: incremental key-based tailing with
offsets in the Spark checkpoint (the streaming generalization of the
reference's chunked remote result streams)."""

from __future__ import annotations

import os
import sqlite3

import pytest

from datafusion_remote_table_spark.remote import RemoteScanSpec, SqliteConnectionOptions
from datafusion_remote_table_spark.remote.stream_datasource import RemoteTableStreamDataSource


@pytest.fixture()
def log_db(tmp_path):
    path = str(tmp_path / "log.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE log (id INTEGER, v TEXT)")
    conn.executemany("INSERT INTO log VALUES (?, ?)", [(i, f"v{i}") for i in range(5)])
    conn.commit()
    conn.close()
    return path


def _run_to_completion(spark, spec, ckpt, out_dir):
    stream = (
        spark.readStream.format("remote_table_stream")
        .schema("id long, v string")
        .option("spec", spec.to_json())
        .option("key_column", "id")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())


def test_incremental_tailing(spark, log_db, tmp_path):
    spark.dataSource.register(RemoteTableStreamDataSource)
    spec = RemoteScanSpec(options=SqliteConnectionOptions(path=log_db), table=["log"])
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    first = _run_to_completion(spark, spec, ckpt, out)
    assert first == [(i, f"v{i}") for i in range(5)]

    # remote table grows; restart from the SAME checkpoint
    conn = sqlite3.connect(log_db)
    conn.executemany("INSERT INTO log VALUES (?, ?)", [(5, "v5"), (6, "v6")])
    conn.commit()
    conn.close()

    second = _run_to_completion(spark, spec, ckpt, out)
    # exactly the two new rows were appended — not a re-read of all 7
    assert second == [(i, f"v{i}") for i in range(7)]
    assert len(second) == 7
