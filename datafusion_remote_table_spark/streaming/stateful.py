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
