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


def test_stream_reader_partitions_are_disjoint_and_executor_side(log_db):
    """The default stream reader plans key-range partitions (the backfill
    parallelism path); read(partition) is the executor-side Arrow fetch,
    not a driver fetchall."""
    from pyspark.sql.types import StructType
    from datafusion_remote_table_spark.remote.stream_datasource import (
        RemoteKeyRangePartition,
        RemoteTableStreamReader,
    )

    spec = RemoteScanSpec(
        options=SqliteConnectionOptions(path=log_db), table=["log"], fetch_partitions=3
    )
    r = RemoteTableStreamReader(spec, "id", StructType.fromDDL("id bigint, v string"))
    assert r.initialOffset() == {"last_key": None}
    end = r.latestOffset()
    assert end == {"last_key": 4}
    parts = r.partitions(r.initialOffset(), end)
    assert len(parts) == 3
    assert all(isinstance(p, RemoteKeyRangePartition) for p in parts)
    # ranges chain (lo, hi] with no gaps and cover all keys
    for a, b in zip(parts, parts[1:]):
        assert a.hi == b.lo
    rows = []
    for p in parts:
        for batch in r.read(p):  # pyarrow RecordBatches (executor path)
            rows.extend(batch.to_pylist())
    assert sorted(x["id"] for x in rows) == [0, 1, 2, 3, 4]
    # caught-up stream: empty microbatch partition yields nothing
    empty = r.partitions(end, end)
    assert len(empty) == 1 and list(r.read(empty[0])) == []


def test_stream_reader_simple_fallback(spark, log_db, tmp_path):
    """.option('reader', 'simple') still selects the driver-side
    SimpleDataSourceStreamReader."""
    spark.dataSource.register(RemoteTableStreamDataSource)
    spec = RemoteScanSpec(options=SqliteConnectionOptions(path=log_db), table=["log"])
    stream = (
        spark.readStream.format("remote_table_stream")
        .schema("id long, v string")
        .option("spec", spec.to_json())
        .option("key_column", "id")
        .option("reader", "simple")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("simple_reader_result")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("simple_reader_result").count() == 5


def test_events_stream_ts_unit_probe(spark, sf_dir):
    """Regression: _events_stream must deliver real event times regardless
    of the parquet timestamp unit (us vs ns). The round-2 bug hardcoded a
    ns->us `ts div 1000` on timestamp[us] files, collapsing every event
    into ~2 hours of January 1970 — this probe fails with a year instead
    of an opaque hash mismatch."""
    from pyspark.sql import functions as F

    from datafusion_remote_table_spark.session import load_tables
    from datafusion_remote_table_spark.streaming.events import _events_stream

    stream = _events_stream(spark, sf_dir)
    probe = stream.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count(F.lit(1)).alias("n")
    )
    q = (
        probe.writeStream.format("memory")
        .queryName("events_ts_probe")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    row = spark.table("events_ts_probe").collect()[0]
    batch = load_tables(spark, sf_dir, ("events",))["events"].select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert row.n == batch.n
    assert row.lo.year > 2000, f"stream ts collapsed to {row.lo} (unit bug)"
    assert (row.lo, row.hi) == (batch.lo, batch.hi)
