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

    cache: dict[str, object] = {}

    def build(name: str):
        if name not in cache:
            cache[name] = plans.QUERIES[name](spark, sf_dir)
        return cache[name]

    return build
