from .events import stream_dedup_stateful, stream_events_windowed, stream_remote_sink  # noqa: F401
