"""Custom stateful streaming operator: gap-based sessionization with
applyInPandasWithState.

This is the operator class Structured Streaming can't express with
built-in aggregations: per-key state (the open session) carried across
microbatches, emitting a row whenever a 30-minute inactivity gap closes
a session. State per user is O(1) — (session_start, last_ts, count,
value_sum) — regardless of stream length.

Determinism contract for the oracle: sessions still open when the
bounded stream ends stay in state (a real stream never ends), so the
output equals batch sessionization minus each user's final session —
exactly expressible in SQL (session_id < max(session_id) per user).
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 1800

_OUT_SCHEMA = "user_id bigint, session_start string, n_events bigint, session_value double"
_STATE_SCHEMA = "session_start_us long, last_us long, n_events long, value_sum double"


def _sessionize_user(key, pdf_iter, state: GroupState):
    (user_id,) = key
    rows = pd.concat(list(pdf_iter), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")

    if state.exists:
        session_start_us, last_us, n_events, value_sum = state.get
    else:
        session_start_us = last_us = None
        n_events, value_sum = 0, 0.0

    closed = []
    for ts, value in zip(rows["ts"], rows["value"]):
        ts_us = int(ts.value // 1000)  # pandas ns → µs
        if last_us is not None and (ts_us - last_us) > GAP_SECONDS * 1_000_000:
            closed.append((user_id, session_start_us, n_events, round(value_sum, 4)))
            session_start_us, n_events, value_sum = ts_us, 0, 0.0
        if session_start_us is None:
            session_start_us = ts_us
        last_us = ts_us
        n_events += 1
        value_sum += float(value)

    state.update((session_start_us, last_us, n_events, value_sum))
    if closed:
        out = pd.DataFrame(closed, columns=["user_id", "start_us", "n_events", "session_value"])
        out["session_start"] = (
            pd.to_datetime(out.pop("start_us"), unit="us").dt.strftime("%Y-%m-%d %H:%M:%S")
        )
        yield out[["user_id", "session_start", "n_events", "session_value"]]


def stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful sessionizer over the bounded events stream and
    return every session closed before stream end."""
    from .events import _events_stream

    stream = _events_stream(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_user,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out_dir = tempfile.mkdtemp(prefix="dfrt_stateful_")
    q = (
        sessions.writeStream.format("memory")
        .queryName("stream_sessionize_stateful")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("stream_sessionize_stateful")


# ---------------------------------------------------------------------------
# stream_scd2_monitor — the streaming twin of events_scd2_history: per-user
# current state (the open SCD2 interval) carried across microbatches in
# O(1) state; whenever an arriving event changes the user's event_type, the
# closed validity interval is emitted. The still-open interval stays in
# state (a real stream never ends), so the bounded-stream output equals the
# batch SCD2 history minus each user's current row — exactly expressible in
# SQL for the oracle.

_SCD_OUT_SCHEMA = (
    "user_id bigint, state string, valid_from string, valid_to string, n_events bigint"
)
_SCD_STATE_SCHEMA = "cur_type string, start_us long, n_events long"


def _scd2_user(key, pdf_iter, state: GroupState):
    (user_id,) = key
    rows = pd.concat(list(pdf_iter), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")

    if state.exists:
        cur_type, start_us, n_events = state.get
    else:
        cur_type, start_us, n_events = None, None, 0

    closed = []
    for ts, et in zip(rows["ts"], rows["event_type"]):
        ts_us = int(ts.value // 1000)  # pandas ns → µs
        if cur_type is None:
            cur_type, start_us, n_events = et, ts_us, 0
        elif et != cur_type:
            closed.append((user_id, cur_type, start_us, ts_us, n_events))
            cur_type, start_us, n_events = et, ts_us, 0
        n_events += 1

    state.update((cur_type, start_us, n_events))
    if closed:
        out = pd.DataFrame(
            closed, columns=["user_id", "state", "start_us", "end_us", "n_events"]
        )
        out["valid_from"] = (
            pd.to_datetime(out.pop("start_us"), unit="us").dt.strftime("%Y-%m-%d %H:%M:%S")
        )
        out["valid_to"] = (
            pd.to_datetime(out.pop("end_us"), unit="us").dt.strftime("%Y-%m-%d %H:%M:%S")
        )
        yield out[["user_id", "state", "valid_from", "valid_to", "n_events"]]


def stream_scd2_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful SCD2 state tracker over the bounded events stream
    and return every validity interval closed before stream end."""
    from .events import _events_stream

    stream = _events_stream(spark, sf_dir).select("event_id", "ts", "user_id", "event_type")
    hist = stream.groupBy("user_id").applyInPandasWithState(
        _scd2_user,
        outputStructType=_SCD_OUT_SCHEMA,
        stateStructType=_SCD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out_dir = tempfile.mkdtemp(prefix="dfrt_scd2_")
    q = (
        hist.writeStream.format("memory")
        .queryName("stream_scd2_monitor")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("stream_scd2_monitor")


# ---------------------------------------------------------------------------
# stream_theta_distinct_monitor — a KMV/theta sketch maintained as
# CUSTOM STREAMING STATE: per source, the k=64 smallest distinct
# md5-uniform word hashes ride applyInPandasWithState (state is k
# BIGINTs per source — constant regardless of stream length), and each
# microbatch emits the source's refreshed distinct-vocabulary estimate;
# the serving layer keeps the latest emission per source. The live
# "how big is each crawl's vocabulary" tile without ever holding a
# vocabulary. KMV merge is order-insensitive (k smallest of a set), so
# on bounded input the final state equals the batch sketch exactly —
# the DuckDB oracle recomputes it from the corpus.
_THETA_K = 64
_THETA_OUT = "source string, n_seen bigint, n_sampled bigint, est_distinct double"
_THETA_STATE = "vals array<bigint>, n_seen long"


def _theta_source(key, pdf_iter, state: GroupState):
    import hashlib
    import re as _re

    (source,) = key
    vals = []
    n_seen = 0
    if state.exists:
        stored_vals, stored_seen = state.get
        vals = list(stored_vals)
        n_seen = int(stored_seen)
    hashes = set(vals)
    rows = pd.concat(list(pdf_iter), ignore_index=True)
    for text in rows["text"]:
        n_seen += 1
        if text is None:
            continue
        for w in _re.split(r"\s+", str(text).strip().lower()):
            if not w:
                continue
            h = int(hashlib.md5(w.encode()).hexdigest()[:13], 16)
            hashes.add(h)
    vals = sorted(hashes)[:_THETA_K]
    state.update((vals, n_seen))
    n_sampled = len(vals)
    if n_sampled < _THETA_K:
        est = float(n_sampled)
    else:
        est = (_THETA_K - 1) * 4503599627370496.0 / vals[-1]
    yield pd.DataFrame(
        [(source, n_seen, n_sampled, round(est, 4))],
        columns=["source", "n_seen", "n_sampled", "est_distinct"],
    )


def stream_theta_distinct_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .events import _docs_stream, _run_bounded

    stream = _docs_stream(spark, sf_dir).select("source", "text")
    est = stream.groupBy("source").applyInPandasWithState(
        _theta_source,
        outputStructType=_THETA_OUT,
        stateStructType=_THETA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    bounded = _run_bounded(est, "stream_theta_distinct_monitor", mode="append")
    w = Window.partitionBy("source").orderBy(F.desc("n_seen"))
    return (
        bounded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "n_sampled", "est_distinct")
        .orderBy("source")
    )
