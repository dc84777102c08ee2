"""SparkSession construction tuned for the engine.

Defaults chosen for local[N] testing but written for cluster scale:
AQE on (runtime re-planning, skew-join handling), Arrow enabled for
every Pandas-UDF hop, shuffle partitions sized by env so a 1000-executor
deployment can raise them without code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


class TestDataNotFoundError(FileNotFoundError):
    """Raised when an sf_dir doesn't hold the requested parquet tables.

    The driver contract (``__spark_entry__``) takes sf_dir from
    ``$SPARK_GRAFT_SF_DIR``; a typo'd path or missing table used to
    surface deep inside a query as a Spark AnalysisException
    ("table or view not found") — this probe names the actual problem
    at load time instead (VERDICT r7 item 5)."""


def get_spark(app_name: str = "datafusion-remote-table-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Every config here matters at scale:
    - AQE: coalesces post-shuffle partitions and splits skewed ones at
      runtime — the 100TB safety net for joins/aggs on skewed keys.
    - Arrow: all mapInPandas/pandas_udf traffic is columnar batches.
    - autoBroadcastJoinThreshold: generous (64m) so dimension tables
      (region/nation/supplier/part at any SF) broadcast instead of shuffle.
    """
    # Python workers must be able to import this package (DataSource and
    # UDF classes are pickled by reference). Local mode inherits the
    # driver env; a real cluster ships the wheel via --py-files.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{repo_root}{os.pathsep}{existing}" if existing else repo_root

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE convert sort-merge to shuffled-hash when the build
        # side's RUNTIME size (per partition, post-shuffle) fits a local
        # hash map — the default of 0 disables the rewrite entirely.
        # 64m matches autoBroadcastJoinThreshold below. Runtime sizes
        # make this the safe variant of the SHJ preference at 100 TB:
        # an over-estimated static plan can't pick a hash build that
        # doesn't fit. Measured (quiet-window interleaved A/B, min-of-3
        # cold, preferSortMergeJoin already false): dedup_graph_pagerank
        # 3.27->2.94, embedding_knn_symmetry_audit 3.19->2.91, controls
        # within noise.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_AQE_SHJ_THRESHOLD", str(64 * 1024 * 1024)),
        )
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Prefer shuffled-hash over sort-merge when a side can build a
        # local hash map (canBuildLocalHashMap still guards the build
        # side; AQE replans joins with runtime sizes and its skew-join
        # handling covers SHJ in Spark 4): skips both sort passes.
        # Measured quiet-window interleaved A/B (r10, min-of-3 cold):
        # SHJ at-or-faster on all 6 SMJ-carrying probes (e.g.
        # tokenize_unigram_prune 3.96->3.61, dedup_graph_pagerank
        # 3.55->3.22, embedding_knn_symmetry_audit 3.46->3.19) with the
        # no-SMJ control within noise. Env-overridable for clusters
        # that want the sort-based spill path back.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config("spark.sql.parquet.filterPushdown", "true")
        # Python DataSource filter pushdown (remote-table scans)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # 128MB splits are right at cluster scale; small-SF local runs can
        # shrink this (env) so a few-MB parquet still fans out over cores.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(128 * 1024 * 1024)),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # Spark has no nanosecond timestamp type; read parquet NANOS as long
        # and convert to microsecond timestamps at load (matches DuckDB's
        # ns→µs truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # RDD/broadcast/checkpoint cleanup rides WEAK references: the
        # ContextCleaner only reclaims blocks after a driver GC, and a
        # large mostly-idle driver heap can go many minutes without one —
        # Spark's own backstop (periodicGC, default 30min) is far too lazy
        # for a many-query single-JVM session, where dead shuffle/
        # broadcast/checkpoint state compounds (measured this round:
        # late-suite queries 10-70x slower at the default; flat with a
        # 1min periodic GC). A real cluster benefits identically — this is
        # the standard setting for long-lived Spark services.
        .config("spark.cleaner.periodicGC.interval", "1min")
        # the periodic System.gc() must not be a stop-the-world full
        # collection: on a 32g heap those pauses ran 5-20 s and landed on
        # whichever query straddled the 1min tick (measured: per-query
        # times swung 5-8x between otherwise-identical idle runs). With
        # ExplicitGCInvokesConcurrent G1 runs it as a concurrent cycle —
        # weak refs still get processed, nothing pauses.
        .config(
            "spark.driver.extraJavaOptions", "-XX:+ExplicitGCInvokesConcurrent"
        )
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    return builder.getOrCreate()


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Set the dynamic SQL confs every query path depends on.

    The correctness driver calls ``queries()`` with a SparkSession it
    built itself, so nothing from ``get_spark`` can be assumed; these are
    all runtime-settable and idempotent.
    """
    for key, value in (
        ("spark.sql.session.timeZone", "UTC"),  # timestamp formatting parity
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),  # events.parquet ns
        ("spark.sql.python.filterPushdown.enabled", "true"),  # remote scans
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.adaptive.enabled", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # static conf on this build — get_spark sessions set it at build time


def local_frame(spark: SparkSession, rows, schema: str) -> "DataFrame":  # noqa: F821
    """Small literal DataFrame as a pure-JVM ``LocalTableScan``.

    ``spark.createDataFrame(list, schema)`` routes the rows through a
    pickled Python RDD: the scan is ``Scan ExistingRDD`` and every
    action runs ``defaultParallelism`` tasks, each a Python-worker
    round trip (measured: 2.4 s on first use / ~0.4 s warm for a 5-row
    frame on local[32], and up to 11 s right after the worker pool
    churns — guide §4, the Python boundary). Routing the same rows
    through a pandas DataFrame takes the Arrow conversion path, which
    embeds them in the plan as a ``LocalTableScan``: zero tasks, no
    Python workers at execution time (~0.1 s cold). Identical rows and
    schema, so results are unchanged — only the physical scan differs.

    Rows must be plain Python scalars (str/int/float/bool/None). The
    object-dtype frame stops pandas from coercing ints to floats or
    None to NaN before Arrow sees them.
    """
    import numpy as np
    import pandas as pd

    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    n_cols = len(rows[0])
    arr = np.empty((len(rows), n_cols), dtype=object)
    for i, row in enumerate(rows):
        for j, value in enumerate(row):
            arr[i, j] = value
    return spark.createDataFrame(pd.DataFrame(arr), schema)


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict:
    """Load the driver-generated parquet tables and register temp views.

    Reads are plain ``spark.read.parquet`` so Catalyst keeps full
    pushdown/pruning; views let plans be written in SQL where clearer.

    STRICT since round 8: a missing sf_dir or any missing requested
    table raises :class:`TestDataNotFoundError` for every caller
    (earlier rounds silently skipped missing tables and returned a
    partial dict, which surfaced as confusing downstream
    TABLE_OR_VIEW_NOT_FOUND errors).
    """
    import pyarrow.parquet as pq
    import pyarrow.types as pat
    from pyspark.sql import functions as F

    ensure_runtime_confs(spark)
    if not os.path.isdir(sf_dir):
        raise TestDataNotFoundError(
            f"sf_dir {sf_dir!r} is not a directory (check $SPARK_GRAFT_SF_DIR)"
        )
    missing = [
        n for n in names
        if not os.path.exists(os.path.join(sf_dir, f"{n}.parquet"))
    ]
    if missing:
        raise TestDataNotFoundError(
            f"sf_dir {sf_dir!r} lacks parquet for requested tables {missing}; "
            f"present: {sorted(f for f in os.listdir(sf_dir) if f.endswith('.parquet'))}"
        )
    parallelism = spark.sparkContext.defaultParallelism
    dfs = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        # existence was checked above (strict missing-table probe)
        df = spark.read.parquet(path)
        # Note: these driver-generated files are single-row-group, so a
        # scan is one task; an explicit repartition-at-load was measured
        # and lost (shuffle cost > parallel-agg savings at this SF) —
        # per-row-heavy operators repartition selectively instead.
        meta = pq.ParquetFile(path)
        # Nanosecond timestamps arrive as long (see nanosAsLong config);
        # truncate to µs — exactly what DuckDB does reading the same file.
        for field in meta.schema_arrow:
            if pat.is_timestamp(field.type) and field.type.unit == "ns":
                df = df.withColumn(field.name, F.expr(f"timestamp_micros({field.name} div 1000)"))
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
