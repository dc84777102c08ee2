"""Unparse Spark DataSource pushdown filters to remote-dialect SQL.

Parity: /root/reference/remote-table/src/transform.rs:52-86
(`DefaultTransform::{support_filter_pushdown, unparse_filter}`): a
filter is pushed only when it unparses cleanly in the target dialect;
anything else is reported back to Spark, which re-applies it locally —
the exact Exact/Unsupported split the reference makes.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

from .dialect import Dialect


class UnsupportedFilter(Exception):
    pass


def _col(dialect: Dialect, attribute) -> str:
    if len(attribute) != 1:
        raise UnsupportedFilter(f"nested column {attribute}")
    return dialect.quote_ident(attribute[0])


def resolve_literalizer(path: str | None):
    """Resolve a 'module:function' import path to the custom literalizer
    callable (parity: try_new_with_schema_transform_literalizer +
    literalize.rs's pluggable `Literalize`). The hook is shipped as an
    import path — code travels with the job (--py-files), only the name
    rides in the JSON spec, mirroring how the reference's codec never
    serializes the literalizer object itself."""
    if path is None:
        return None
    mod, _, fn = path.partition(":")
    if not mod or not fn:
        raise ValueError(f"literalizer must be 'module:function', got {path!r}")
    import importlib

    return getattr(importlib.import_module(mod), fn)


def _lit(dialect: Dialect, value, literal=None) -> str:
    """Render one literal: the custom hook first (returning None defers),
    the dialect's default otherwise — DefaultLiteralizer fallthrough."""
    if literal is not None:
        rendered = literal(value, dialect)
        if rendered is not None:
            return rendered
    return dialect.literal(value)


def unparse_filter(f: Filter, dialect: Dialect, literal=None) -> str:
    """Render one pushdown filter as remote SQL, or raise UnsupportedFilter."""
    if isinstance(f, EqualTo):
        return f"{_col(dialect, f.attribute)} = {_lit(dialect, f.value, literal)}"
    if isinstance(f, EqualNullSafe):
        c, v = _col(dialect, f.attribute), _lit(dialect, f.value, literal)
        return f"({c} = {v} OR ({c} IS NULL AND {v} IS NULL))"
    if isinstance(f, GreaterThan):
        return f"{_col(dialect, f.attribute)} > {_lit(dialect, f.value, literal)}"
    if isinstance(f, GreaterThanOrEqual):
        return f"{_col(dialect, f.attribute)} >= {_lit(dialect, f.value, literal)}"
    if isinstance(f, LessThan):
        return f"{_col(dialect, f.attribute)} < {_lit(dialect, f.value, literal)}"
    if isinstance(f, LessThanOrEqual):
        return f"{_col(dialect, f.attribute)} <= {_lit(dialect, f.value, literal)}"
    if isinstance(f, In):
        if not f.value:
            return "1 = 0"
        # render element-wise so a custom literalizer sees each VALUE —
        # passing the whole list would bypass per-value hooks
        rendered = ", ".join(_lit(dialect, v, literal) for v in f.value)
        return f"{_col(dialect, f.attribute)} IN ({rendered})"
    if isinstance(f, IsNull):
        return f"{_col(dialect, f.attribute)} IS NULL"
    if isinstance(f, IsNotNull):
        return f"{_col(dialect, f.attribute)} IS NOT NULL"
    if isinstance(f, Not):
        return f"NOT ({unparse_filter(f.child, dialect, literal)})"
    if isinstance(f, StringStartsWith):
        return dialect.string_match(_col(dialect, f.attribute), f.value, "starts")
    if isinstance(f, StringEndsWith):
        return dialect.string_match(_col(dialect, f.attribute), f.value, "ends")
    if isinstance(f, StringContains):
        return dialect.string_match(_col(dialect, f.attribute), f.value, "contains")
    raise UnsupportedFilter(f"filter {type(f).__name__} not unparseable")


def split_filters(
    filters: list[Filter], dialect: Dialect, literal=None
) -> tuple[list[str], list[Filter]]:
    """Partition filters into (pushed SQL strings, unsupported originals).

    Unsupported ones go back to Spark for local evaluation — pushdown is
    an optimization, never a correctness dependency. A custom literalizer
    that raises keeps its filter on the unsupported side (the reference's
    support_filter_pushdown contract: unparse cleanly or don't push)."""
    pushed_sql: list[str] = []
    unsupported: list[Filter] = []
    for f in filters:
        try:
            pushed_sql.append(unparse_filter(f, dialect, literal))
        except Exception:
            # ANY unparse failure (unsupported shape, dialect gap, a
            # raising literalizer hook) keeps the filter Spark-side —
            # falling back is always correct, pushing a bad render never is
            unsupported.append(f)
    return pushed_sql, unsupported
