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
