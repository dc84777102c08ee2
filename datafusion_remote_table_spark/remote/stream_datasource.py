"""Streaming remote-table source: incremental tailing of a remote table
by a monotonically increasing key column.

The reference streams a remote result set once (chunked record
batches); Structured Streaming generalizes that to an unbounded source:
each microbatch fetches rows with key > last committed offset, so a
growing remote table (CDC-style append log, autoincrement OLTP table)
feeds a Spark streaming pipeline with exactly-once offsets tracked in
the checkpoint.

Usage:
    spark.dataSource.register(RemoteTableStreamDataSource)
    stream = (spark.readStream.format("remote_table_stream")
              .schema(schema)
              .option("spec", spec.to_json())
              .option("key_column", "id")
              .load())

Scale: each microbatch is one remote range scan (key > last), the
remote side serves it from the key index; Spark state/offsets are O(1).
The simple reader runs the fetch on the driver — acceptable because a
tailing microbatch is incremental by construction; bulk backfill should
use the batch DataSource with fetch_partitions.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from .connection import connect
from .scan import RemoteScanSpec


class RemoteTableSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, spec: RemoteScanSpec, key_column: str, schema: StructType):
        self.spec = spec
        self.key_column = key_column
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"last_key": None}

    def _fetch(self, last_key) -> tuple[list, dict]:
        d = self.spec.dialect
        key = d.quote_ident(self.key_column)
        cols = ", ".join(d.quote_ident(f.name) for f in self.schema.fields)
        src = d.wrap_subquery(self.spec.source_query())
        where = f"WHERE {key} > {d.literal(last_key)}" if last_key is not None else ""
        sql = f"SELECT {cols} FROM {src} {where} ORDER BY {key}"
        conn = connect(self.spec.options)
        try:
            cur = conn.cursor()
            cur.execute(sql)
            rows = cur.fetchall()
        finally:
            conn.close()
        new_last = rows[-1][[f.name for f in self.schema.fields].index(self.key_column)] if rows else last_key
        return rows, {"last_key": new_last}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        rows, end = self._fetch(start.get("last_key"))
        return iter(rows), end

    def commit(self, end: dict) -> None:
        pass  # offsets live in the Spark checkpoint; nothing remote to ack


class RemoteTableStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "remote_table_stream"

    def simpleStreamReader(self, schema: StructType) -> RemoteTableSimpleStreamReader:
        spec = RemoteScanSpec.from_json(self.options["spec"])
        return RemoteTableSimpleStreamReader(spec, self.options["key_column"], schema)
