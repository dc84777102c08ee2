"""Text-analysis column functions (JVM-side, whole-stage-codegen
friendly: built on split/transform/filter/md5 — no Python UDFs in the
hot path)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column, bpe_ish: bool = False) -> Column:
    """Token count: whitespace words, or a BPE-ish regex segmentation
    (alnum runs + individual punctuation)."""
    if bpe_ish:
        return F.regexp_count(text, F.lit(r"[a-z0-9]+|[^a-z0-9 ]")).cast("bigint")
    return F.size(tokens(text)).cast("bigint")


def collapse_ws(text: Column) -> Column:
    return F.regexp_replace(text, r"\s+", " ")


def content_fingerprint(text: Column) -> Column:
    """Normalized-content md5 fingerprint (exact-dedup key)."""
    return F.md5(collapse_ws(F.lower(text)))


def ngram_shingles(text: Column, n: int = 5, distinct: bool = True) -> Column:
    """Word n-gram shingle array (per-row, no shuffle)."""
    w = tokens(F.lower(text))
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(w, i, n), " "),
    )
    return F.array_distinct(sh) if distinct else sh


def quality_features(text: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> dict[str, Column]:
    """Length / stopword / repetition features used for quality scoring."""
    w = tokens(text)
    n_tokens = F.size(w).cast("bigint")
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t))).cast("bigint")
    n_distinct = F.size(F.array_distinct(w)).cast("bigint")
    return {
        "n_chars": F.length(text).cast("bigint"),
        "n_tokens": n_tokens,
        "stopword_ratio": n_stop.cast("double") / n_tokens,
        "repetition_ratio": F.lit(1.0) - n_distinct.cast("double") / n_tokens,
    }


def langid_scores(text: Column, markers: dict[str, tuple[str, ...]]) -> Column:
    """Array of (lang, marker-hit-count) structs; argmax downstream picks
    the detected language."""
    w = tokens(text)
    entries = []
    for lang, words in sorted(markers.items()):
        arr = F.array(*[F.lit(m) for m in words])
        score = F.size(F.filter(w, lambda t: F.array_contains(arr, t))).cast("bigint")
        entries.append(F.struct(F.lit(lang).alias("lang"), score.alias("score")))
    return F.array(*entries)
