"""Query plan library.

Every implemented operator/query from SURVEY.md §2 registers itself here:
a callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a
DuckDB-compatible oracle SQL string over the same parquet tables.

Determinism conventions (so value-hashes match the DuckDB oracle):
- money/quantity aggregates: cast operands to DECIMAL before SUM (exact,
  order-independent), cast the result back to DOUBLE;
- timestamps in outputs are formatted to strings in both engines;
- every top-k has a total-order tie-break on a unique key;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional oracle SQL) to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return wrap


def load_all() -> None:
    """Import every plan module so registration side effects run.

    Order matters: the driver verifies queries in registration order under a
    budget, so the federated remote engine (the reference's core, §2.A) and
    streaming (§2.D) register first, then the relational surface and the
    LLM-data operators.
    """
    from . import remote_queries  # noqa: F401
    from . import streaming_plans  # noqa: F401
    from . import relational  # noqa: F401
    from . import llm_data  # noqa: F401
