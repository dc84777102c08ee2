"""Corpus-cleaning operators as a reusable DataFrame API.

The fixed-parameter versions registered in plans/llm_data.py are the
driver-verified instances of these; this module exposes the same
algorithms with tunable parameters for pipeline use (same contract as
operators/dedup.py).

Scale posture (100TB):
- segment/shingle fingerprints are per-row map work (no Python, no
  shuffle until the census);
- censuses shuffle on uniform md5 keys; their outputs (repeated
  segments, benchmark shingle sets) are tiny relative to the corpus, so
  back-joins broadcast;
- sequence packing is a per-shard running-sum window: shards are
  independent, parallelism = shard count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import ngram_shingles, tokens


def segment_fingerprints(text: Column, seg_words: int = 5) -> Column:
    """Fixed-width word-segment md5 fingerprints (the 'lines' of a
    newline-free corpus; swap for split('\\n') on a newline corpus)."""
    words = tokens(F.lower(text))
    n_segs = F.greatest(
        (F.size(words) + F.lit(seg_words - 1)).cast("long") / F.lit(seg_words), F.lit(1)
    ).cast("int")
    return F.transform(
        F.sequence(F.lit(1), n_segs),
        lambda i: F.md5(F.array_join(F.slice(words, (i - F.lit(1)) * seg_words + F.lit(1), seg_words), " ")),
    )


def _fingerprint_census_stats(
    df: DataFrame,
    fps: Column,
    id_col: str,
    min_docs: int,
    total_col: str,
    flagged_col: str,
) -> DataFrame:
    """Shared census skeleton: explode a per-doc fingerprint array, keep
    fingerprints seen in >= min_docs distinct docs (the census output is
    tiny vs the corpus → broadcast back-join), and count total/flagged
    positions per doc."""
    rows = df.select(F.col(id_col), F.explode(fps).alias("fp"))
    flagged = (
        rows.groupBy("fp")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("fp")
    )
    return (
        rows.join(F.broadcast(flagged.withColumn("__f", F.lit(1))), "fp", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias(total_col),
            F.sum(F.when(F.col("__f").isNotNull(), 1).otherwise(0)).alias(flagged_col),
        )
    )


def boilerplate_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 5,
    min_docs: int = 3,
) -> DataFrame:
    """C4-style repeated-segment census → per-doc boilerplate stats
    (n_segments, n_boilerplate, retained_ratio)."""
    stats = _fingerprint_census_stats(
        df,
        segment_fingerprints(F.col(text_col), seg_words),
        id_col,
        min_docs,
        "n_segments",
        "n_boilerplate",
    )
    return stats.withColumn(
        "retained_ratio",
        F.round(F.lit(1.0) - F.col("n_boilerplate") / F.col("n_segments"), 6),
    )


def ngram_decontaminate(
    train_df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination check: per training doc, the count of
    distinct n-gram fingerprints shared with the benchmark corpus and a
    contaminated flag. The benchmark's distinct shingle set is
    eval-suite-sized → broadcast; the corpus side never shuffles."""
    sh = lambda d: d.select(  # noqa: E731
        F.col(id_col), F.explode(ngram_shingles(F.col(text_col), n, distinct=True)).alias("fp")
    )
    bench = sh(bench_df).select("fp").distinct()
    return (
        sh(train_df)
        .join(F.broadcast(bench.withColumn("__hit", F.lit(1))), "fp", "left")
        .groupBy(id_col)
        .agg(
            F.countDistinct(F.when(F.col("__hit").isNotNull(), F.col("fp"))).alias("n_overlap"),
        )
        .withColumn("contaminated", (F.col("n_overlap") > 0).cast("int"))
    )


def pack_sequences(
    chunks_df: DataFrame,
    tokens_col: str = "n_tokens",
    order_cols: tuple[str, ...] = ("shuffle_key",),
    shard_col: str = "shard",
    capacity: int = 128,
) -> DataFrame:
    """Greedy contiguous packing of token chunks into fixed-capacity
    training sequences, independently per shard (running-sum window)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    offset = cum - F.col(tokens_col)
    return chunks_df.withColumn("seq_id", (offset / capacity).cast("long")).withColumn(
        "offset_in_seq", (offset - F.col("seq_id") * capacity).cast("long")
    )


def substring_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Sliding word n-gram duplicated-span census (the n-gram
    approximation of suffix-array substring dedup): per doc, how many of
    its overlapping `span_words`-gram positions are shared with at least
    `min_docs - 1` other docs. Returns (id, n_positions, n_dup_positions,
    dup_span_fraction). Registered instance: dedup_substring_spans."""
    words = tokens(F.lower(F.col(text_col)))
    n_pos = F.greatest(F.size(words) - F.lit(span_words - 1), F.lit(1))
    fps = F.transform(
        F.sequence(F.lit(1), n_pos),
        lambda i: F.md5(F.array_join(F.slice(words, i, span_words), " ")),
    )
    stats = _fingerprint_census_stats(
        df, fps, id_col, min_docs, "n_positions", "n_dup_positions"
    )
    return stats.withColumn(
        "dup_span_fraction",
        F.round(F.col("n_dup_positions") / F.col("n_positions"), 6),
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_words: int = 5,
) -> DataFrame:
    """Per-doc novel n-gram rate: a shingle is novel at doc d when d is
    the first (min id) doc containing it — the crawl saturation signal
    (tunable twin of the registered ``text_ngram_novelty`` instance).

    Shingles are carried as 60-bit md5 hashes like the minhash staging
    (set identity is all first-seen needs). Scale: explode -> census on
    uniform hash keys -> back-join on the same keys -> per-doc rollup.
    """
    sh = ngram_shingles(F.col(text_col), n=n_words)
    hashed = F.transform(
        sh, lambda s: F.conv(F.md5(s).substr(F.lit(1), F.lit(15)), 16, 10).cast("long")
    )
    grams = (
        df.select(F.col(id_col).alias("__doc"), F.explode(hashed).alias("gram"))
        .where(F.col("gram").isNotNull())
    )
    firsts = grams.groupBy("gram").agg(F.min("__doc").alias("first_doc"))
    novel = F.sum(F.when(F.col("first_doc") == F.col("__doc"), 1).otherwise(0)).cast("bigint")
    return (
        grams.join(firsts, "gram")
        .groupBy("__doc")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            novel.alias("n_novel"),
        )
        .select(
            F.col("__doc").alias(id_col),
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel").cast("double") / F.col("n_grams"), 6).alias("novelty_rate"),
        )
    )


def substring_clip(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_words: int = 4,
    min_clip_words: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-dedup CLIP rewrite (Lee et al. 2022 span removal;
    tunable twin of the registered ``dedup_substring_clip`` instance):
    maximal runs of cross-doc duplicated ``gram_words``-gram positions
    spanning at least ``min_clip_words`` words are clipped, their word
    intervals union-merged (consecutive runs closer than the gram
    width OVERLAP in word space and must not double-count), and each
    clipped doc reports exact removed/retained word counts. Returns
    (id, n_words, n_clips, clipped_words, longest_clip_words,
    retained_words, retained_fraction) for docs with >= 1 clip. All
    windows run over duplicated positions / clip survivors only,
    partitioned by doc id — never over the corpus."""
    from pyspark.sql import Window

    min_grams = min_clip_words - gram_words + 1
    words = tokens(F.lower(F.col(text_col)))
    n_pos = F.greatest(F.size("w") - F.lit(gram_words - 1), F.lit(1))
    pos = (
        df.select(F.col(id_col).alias("id"), words.alias("w"))
        .select("id", "w", F.explode(F.sequence(F.lit(1), n_pos)).alias("i"))
        .select(
            "id",
            "i",
            F.md5(F.array_join(F.slice(F.col("w"), F.col("i"), gram_words), " ")).alias("fp"),
        )
    )
    dup = (
        pos.groupBy("fp")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("fp")
    )
    dpos = pos.join(dup, "fp").select("id", "i")
    isl = dpos.withColumn(
        "grp", F.col("i") - F.row_number().over(Window.partitionBy("id").orderBy("i"))
    )
    runs = (
        isl.groupBy("id", "grp")
        .agg(
            F.min("i").alias("s"),
            (F.max("i") + F.lit(gram_words - 1)).alias("e"),
            F.count(F.lit(1)).alias("g"),
        )
        .filter(F.col("g") >= min_grams)
    )
    w_prev = Window.partitionBy("id").orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.partitionBy("id").orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    clips = (
        runs.withColumn(
            "new_clip", F.when(F.max("e").over(w_prev) >= F.col("s"), 0).otherwise(1)
        )
        .withColumn("clip_id", F.sum("new_clip").over(w_cum))
        .groupBy("id", "clip_id")
        .agg(F.min("s").alias("cs"), F.max("e").alias("ce"))
    )
    perdoc = clips.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_clips"),
        F.sum(F.col("ce") - F.col("cs") + 1).cast("long").alias("clipped_words"),
        F.max(F.col("ce") - F.col("cs") + 1).cast("long").alias("longest_clip_words"),
    )
    wc = df.select(F.col(id_col).alias("id"), F.size(words).cast("long").alias("n_words"))
    retained = (F.col("n_words") - F.col("clipped_words")).cast("long")
    return perdoc.join(wc, "id").select(
        F.col("id").alias(id_col),
        "n_words",
        "n_clips",
        "clipped_words",
        "longest_clip_words",
        retained.alias("retained_words"),
        (F.floor(retained / F.col("n_words") * 1000000.0 + 0.5) / 1000000.0).alias(
            "retained_fraction"
        ),
    )
