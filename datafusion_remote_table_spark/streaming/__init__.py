from .events import stream_dedup_stateful, stream_events_windowed  # noqa: F401
