"""Explicit predicate pushdown: parse a user-supplied SQL boolean
expression, validate it, and render it in the remote dialect.

Parity motivation: the reference unparses ANY DataFusion expression that
renders cleanly — OR-disjunctions, arithmetic, BETWEEN — and rejects only
scalar functions (/root/reference/remote-table/src/transform.rs:52-86,
table.rs:382-420). PySpark's Python DataSource filter API only delivers
atomic conjuncts to `pushFilters`, so a disjunctive filter written as a
DataFrame `.filter()` can never reach the remote SQL through Catalyst.
`RemoteTable.read(predicate=...)` is the escape hatch: the expression is
parsed here (a small Pratt parser over the ANSI comparison/BETWEEN/IN/
LIKE/IS NULL/arithmetic grammar — exactly the surface the reference
unparses), column references are checked against the remote schema,
scalar function calls are rejected (the reference's rule), and literals
render through the SAME per-dialect hooks the Catalyst pushdown path
uses (Dialect.literal / date / timestamp / boolean spellings), so the
composed SQL is correct on every backend.

Security note: the predicate is parsed into an AST and re-rendered —
never string-interpolated — so stray quotes, comments, or statement
separators in the input fail the parse instead of reaching the remote.
"""

from __future__ import annotations

import datetime as dt
import re
from dataclasses import dataclass
from typing import Sequence

from .dialect import Dialect


class PredicateError(ValueError):
    """The predicate is malformed, references an unknown column, or uses
    a construct the remote dialect round-trip does not support (scalar
    functions, subqueries)."""


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<str>'(?:[^']|'')*')
  | (?P<qid>"(?:[^"]|"")*")
  | (?P<id>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><>|!=|<=|>=|=|<|>|\(|\)|,|\+|-|\*|/|%)
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "BETWEEN", "IN", "LIKE", "IS", "NULL",
    "TRUE", "FALSE", "DATE", "TIMESTAMP",
}


@dataclass
class _Tok:
    kind: str  # 'num' | 'str' | 'col' | 'kw' | 'op' | 'end'
    value: str


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise PredicateError(f"unexpected character {text[pos]!r} at offset {pos}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        v = m.group()
        if m.lastgroup == "id":
            up = v.upper()
            toks.append(_Tok("kw", up) if up in _KEYWORDS else _Tok("col", v))
        elif m.lastgroup == "qid":
            toks.append(_Tok("col", v[1:-1].replace('""', '"')))
        else:
            toks.append(_Tok(m.lastgroup, v))
    toks.append(_Tok("end", ""))
    return toks


class _Parser:
    def __init__(self, toks: list[_Tok], columns: set[str] | None):
        self.toks = toks
        self.i = 0
        self.columns = columns

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, value: str | None = None) -> _Tok | None:
        t = self.peek()
        if t.kind == kind and (value is None or t.value == value):
            return self.next()
        return None

    def expect(self, kind: str, value: str | None = None) -> _Tok:
        t = self.accept(kind, value)
        if t is None:
            raise PredicateError(
                f"expected {value or kind}, got {self.peek().value or 'end of input'!r}"
            )
        return t

    # -- grammar ------------------------------------------------------------
    def parse(self):
        node = self.or_expr()
        if self.peek().kind != "end":
            raise PredicateError(f"trailing input at {self.peek().value!r}")
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.accept("kw", "OR"):
            node = ("or", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.not_expr()
        while self.accept("kw", "AND"):
            node = ("and", node, self.not_expr())
        return node

    def not_expr(self):
        if self.accept("kw", "NOT"):
            return ("not", self.not_expr())
        return self.predicate()

    def predicate(self):
        left = self.additive()
        t = self.peek()
        if t.kind == "op" and t.value in ("=", "<>", "!=", "<", "<=", ">", ">="):
            self.next()
            op = "<>" if t.value == "!=" else t.value
            return ("cmp", op, left, self.additive())
        negated = False
        if t.kind == "kw" and t.value == "NOT":
            nxt = self.toks[self.i + 1]
            if nxt.kind == "kw" and nxt.value in ("BETWEEN", "IN", "LIKE"):
                self.next()
                negated = True
                t = self.peek()
        if t.kind == "kw" and t.value == "BETWEEN":
            self.next()
            lo = self.additive()
            self.expect("kw", "AND")
            hi = self.additive()
            return ("between", left, lo, hi, negated)
        if t.kind == "kw" and t.value == "IN":
            self.next()
            self.expect("op", "(")
            items = [self.additive()]
            while self.accept("op", ","):
                items.append(self.additive())
            self.expect("op", ")")
            return ("in", left, items, negated)
        if t.kind == "kw" and t.value == "LIKE":
            self.next()
            pat = self.next()
            if pat.kind != "str":
                raise PredicateError("LIKE pattern must be a string literal")
            return ("like", left, pat.value[1:-1].replace("''", "'"), negated)
        if t.kind == "kw" and t.value == "IS":
            self.next()
            neg = self.accept("kw", "NOT") is not None
            self.expect("kw", "NULL")
            return ("isnull", left, neg)
        return left

    def additive(self):
        node = self.multiplicative()
        while True:
            t = self.peek()
            if t.kind == "op" and t.value in ("+", "-"):
                self.next()
                node = ("arith", t.value, node, self.multiplicative())
            else:
                return node

    def multiplicative(self):
        node = self.unary()
        while True:
            t = self.peek()
            if t.kind == "op" and t.value in ("*", "/", "%"):
                self.next()
                node = ("arith", t.value, node, self.unary())
            else:
                return node

    def unary(self):
        if self.accept("op", "-"):
            return ("neg", self.unary())
        return self.primary()

    def primary(self):
        t = self.next()
        if t.kind == "num":
            if "." in t.value or "e" in t.value or "E" in t.value:
                return ("lit", float(t.value))
            return ("lit", int(t.value))
        if t.kind == "str":
            return ("lit", t.value[1:-1].replace("''", "'"))
        if t.kind == "kw":
            if t.value == "NULL":
                return ("lit", None)
            if t.value == "TRUE":
                return ("lit", True)
            if t.value == "FALSE":
                return ("lit", False)
            if t.value in ("DATE", "TIMESTAMP"):
                s = self.expect("str")
                raw = s.value[1:-1]
                try:
                    if t.value == "DATE":
                        return ("lit", dt.date.fromisoformat(raw))
                    return ("lit", dt.datetime.fromisoformat(raw))
                except ValueError as ex:
                    raise PredicateError(f"bad {t.value} literal {raw!r}: {ex}") from ex
            raise PredicateError(f"unexpected keyword {t.value}")
        if t.kind == "col":
            if self.peek().kind == "op" and self.peek().value == "(":
                # the reference's rule (transform.rs:52-86): scalar
                # functions don't round-trip across dialects — reject
                raise PredicateError(
                    f"scalar function {t.value!r} is not pushed down; "
                    "filter in Spark instead"
                )
            if self.columns is not None and t.value not in self.columns:
                raise PredicateError(
                    f"unknown column {t.value!r}; remote columns: "
                    f"{sorted(self.columns)}"
                )
            return ("col", t.value)
        if t.kind == "op" and t.value == "(":
            node = self.or_expr()
            self.expect("op", ")")
            return node
        raise PredicateError(f"unexpected token {t.value or 'end of input'!r}")


def _render(node, d: Dialect) -> str:
    kind = node[0]
    if kind == "col":
        return d.quote_ident(node[1])
    if kind == "lit":
        return d.literal(node[1])
    if kind == "neg":
        return f"(- {_render(node[1], d)})"
    if kind == "arith":
        return f"({_render(node[2], d)} {node[1]} {_render(node[3], d)})"
    if kind == "cmp":
        return f"{_render(node[2], d)} {node[1]} {_render(node[3], d)}"
    if kind == "and":
        return f"({_render(node[1], d)} AND {_render(node[2], d)})"
    if kind == "or":
        return f"({_render(node[1], d)} OR {_render(node[2], d)})"
    if kind == "not":
        return f"NOT ({_render(node[1], d)})"
    if kind == "between":
        neg = "NOT " if node[4] else ""
        return (
            f"{_render(node[1], d)} {neg}BETWEEN {_render(node[2], d)} "
            f"AND {_render(node[3], d)}"
        )
    if kind == "in":
        neg = "NOT " if node[3] else ""
        items = ", ".join(_render(i, d) for i in node[2])
        return f"{_render(node[1], d)} {neg}IN ({items})"
    if kind == "like":
        neg = "NOT " if node[3] else ""
        return f"{_render(node[1], d)} {neg}LIKE '{d.escape_string(node[2])}'"
    if kind == "isnull":
        return f"{_render(node[1], d)} IS {'NOT ' if node[2] else ''}NULL"
    raise PredicateError(f"unrenderable node {kind}")


def render_predicate(
    text: str, dialect: Dialect, columns: Sequence[str] | None = None
) -> str:
    """Parse ``text`` and return its remote-dialect SQL rendering.

    Raises PredicateError on syntax errors, unknown columns (when
    ``columns`` is given), scalar function calls, or literals the
    dialect cannot render."""
    ast = _Parser(_tokenize(text), set(columns) if columns is not None else None).parse()
    return _render(ast, dialect)


def render_expression(
    text: str, dialect: Dialect, columns: Sequence[str] | None = None
) -> str:
    """Like render_predicate but for a scalar VALUE expression (an
    UPDATE assignment right-hand side): arithmetic over columns and
    literals — same validation, same per-dialect literal hooks."""
    p = _Parser(_tokenize(text), set(columns) if columns is not None else None)
    ast = p.additive()
    if p.peek().kind != "end":
        raise PredicateError(f"trailing input at {p.peek().value!r}")
    return _render(ast, dialect)
