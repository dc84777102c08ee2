"""Streaming operator entries (SURVEY.md §2.D).

Structured Streaming queries executed to completion over the bounded
events stream — convergence to the batch answer is the correctness
property, so they get full DuckDB oracles, not just rows-only checks.
"""

from __future__ import annotations

from ..streaming import stream_dedup_stateful, stream_events_windowed
from . import ORACLE, QUERIES

QUERIES["stream_events_windowed"] = stream_events_windowed
ORACLE["stream_events_windowed"] = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window_start, event_type
"""

QUERIES["stream_dedup_stateful"] = stream_dedup_stateful
ORACLE["stream_dedup_stateful"] = """
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique_events
    FROM events GROUP BY event_type
"""
