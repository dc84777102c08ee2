from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Test-session Spark tuning (r11, suite-duration work — see
# OPTIMIZATION_r11.md "pytest under the cap"): the suite runs hundreds of
# tiny (sf0.001 / random-table) actions where fixed per-action overhead
# dominates, and 32 initial shuffle partitions on a local[4] session is
# pure scheduling overhead (AQE coalesces them anyway). 8 was measured
# ~8% faster on a representative query subset with zero plan-shape
# changes (no pin asserts a partition count). Env-overridable like the
# production default.
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

from datafusion_remote_table_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # master env-overridable; local[4] measured at-or-faster than
    # local[8] for this tiny-action suite (r11)
    master = os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]")
    spark = get_spark("tests", master=master)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def qbuild(spark, sf_dir):
    """Session-memoized query builder: ``qbuild(name)`` returns the
    registered query's DataFrame at the test sf_dir, built once.

    Three full-registry sweeps (the sf0.001 oracle gate, the
    cartesian-product sweep, the unpartitioned-window inventory) each
    used to re-build every query's plan — load_tables + analysis +
    (cached) staging lookups, ~0.2-0.5 s x ~415 queries x 3. DataFrames
    are immutable logical plans, the session and sf_dir are fixed, and
    stagings are already session-cached, so sharing one build is
    result-identical (r11 suite-duration work).
    """
    from datafusion_remote_table_spark import plans

    import threading

    cache: dict[str, object] = {}
    lock = threading.Lock()

    def build(name: str):
        # serialized: staging caches, temp-view registration and the
        # eager checkpoint builds inside query constructors are not
        # written for concurrent callers (qpandas threads reach here)
        with lock:
            if name not in cache:
                cache[name] = plans.QUERIES[name](spark, sf_dir)
            return cache[name]

    return build


@pytest.fixture(scope="session")
def qplan(spark, sf_dir):
    """Session-memoized NEVER-EXECUTED query builds for plan-shape
    inspection. qbuild's DataFrames get executed by the oracle gate
    (qpandas), and a formatted explain on an executed DataFrame shows
    the AQE-FINAL plan — runtime SMJ→SHJ conversions, AQEShuffleRead —
    not the static plan the shape pins certify (measured: the SHJ
    build-side pins authored on static plans failed against final
    plans with exactly the AQE-converted join count). One fresh build
    per name, shared by the cartesian sweep, the SHJ pins and the
    window inventory, kept strictly un-executed."""
    from datafusion_remote_table_spark import plans

    cache: dict[str, object] = {}

    def build(name: str):
        if name not in cache:
            cache[name] = plans.QUERIES[name](spark, sf_dir)
        return cache[name]

    return build


@pytest.fixture(scope="session")
def qpandas(qbuild):
    """Session-memoized threaded collect: ``qpandas(name)`` returns the
    registered query's sf0.001 result as pandas.

    The full-registry oracle gate used to run ~412 tiny toPandas actions
    serially, each dominated by fixed per-action overhead (planning, AQE
    round trips, scheduling). Actions on one SparkSession are independent
    jobs the scheduler happily overlaps (optimization guide §2.6), so the
    FIRST lookup computes every query's result through a small thread
    pool — builds stay serialized in qbuild (staging caches / temp views
    are single-writer), only the collect runs concurrently. Results are
    identical; per-test assertions and attribution are unchanged
    (r11 suite-duration work, VERDICT r10 item 1)."""
    from concurrent.futures import ThreadPoolExecutor

    from datafusion_remote_table_spark import plans

    out: dict[str, object] = {}

    def one(name: str) -> None:
        try:
            out[name] = qbuild(name).toPandas()
        except Exception as ex:  # noqa: BLE001 — re-raised by the owning test
            out[name] = ex

    names = sorted(n for n in plans.QUERIES if n in plans.ORACLE)
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(one, names))

    def get(name: str):
        if name not in out:
            one(name)
        val = out[name]
        if isinstance(val, Exception):
            raise val
        return val

    return get
