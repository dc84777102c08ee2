"""Per-batch transform hook.

Parity: /root/reference/remote-table/src/transform.rs — a user hook
rewriting every record batch (and its schema) between the remote scan
and the downstream plan. The Spark-native expression is `mapInPandas`:
the hook receives Arrow-backed pandas batches on executors, so the
shape, batch-wise application, and schema-change semantics match the
reference's `TransformStream` exactly.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame

from .schema import parse_user_schema


class RemoteTransform:
    """Wraps ``fn(pdf) -> pdf`` plus the transformed output schema
    (transform_schema parity: the reference derives it by running the
    hook on an empty batch; Spark needs it declared up front)."""

    def __init__(self, fn: Callable[[pd.DataFrame], pd.DataFrame], output_schema):
        self.fn = fn
        self.output_schema = parse_user_schema(output_schema)

    def apply(self, df: DataFrame) -> DataFrame:
        fn = self.fn

        def _map(batches):
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(_map, schema=self.output_schema)
