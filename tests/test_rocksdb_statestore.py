"""Run the applyInPandasWithState operators under the RocksDB state
store provider (VERDICT r7 item 4).

The default HDFS-backed in-memory provider is what every other suite
exercises; a 100TB cluster runs RocksDB
(``spark.sql.streaming.stateStore.providerClass``), which has its own
state (de)serialization path and timeout handling — a schema the
in-memory provider tolerates can fail RocksDB's stricter encoding. Each
op must converge to the SAME DuckDB oracle as under the default store.

The provider is a runtime SQL conf read at streaming-query start, so it
can be flipped per-test and restored; each op writes to a fresh
checkpoint dir (tempfile.mkdtemp inside the runner), so no state from
the default-provider suites can leak in.
"""

from __future__ import annotations

import pytest

from datafusion_remote_table_spark import plans

from .oracle_util import compare

plans.load_all()

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_CONF = "spark.sql.streaming.stateStore.providerClass"

# round-8 proved tuple state (sessionize), string state (scd2) and
# array state (theta sketch); round 9 extends to the remaining stateful
# families (VERDICT r8 item 7): sorted-list state (funnel latency, the
# encoding most likely to hit a RocksDB edge), the built-in
# dropDuplicates state operator, and the stream-stream join state
# (attribution).
_STATEFUL = [
    "stream_sessionize_stateful",
    "stream_scd2_monitor",
    "stream_theta_distinct_monitor",
    "stream_funnel_latency",
    "stream_dedup_stateful",
    "stream_stream_attribution",
    # round 9: the URL monitor's complete-mode agg keyed on a DERIVED
    # string pair (host, canon_url) — regexp-built keys through the
    # RocksDB encoder
    "stream_url_host_monitor",
    # round 10: the t-closeness monitor's complete-mode agg keyed on a
    # FOUR-part mixed-type composite (int, string, bigint, string)
    # built through a stream-static broadcast join — the widest
    # composite grouping key in the suite
    "stream_t_closeness_monitor",
]


@pytest.mark.parametrize("name", _STATEFUL)
def test_stateful_op_matches_oracle_on_rocksdb(spark, sf_dir, name):
    prev = spark.conf.get(_CONF, None)
    spark.conf.set(_CONF, _ROCKSDB)
    try:
        df = plans.QUERIES[name](spark, sf_dir)
        compare(df, plans.ORACLE[name], sf_dir)
    finally:
        if prev is None:
            spark.conf.unset(_CONF)
        else:
            spark.conf.set(_CONF, prev)
