from .events import (  # noqa: F401
    stream_corpus_mix_monitor,
    stream_dedup_stateful,
    stream_doc_quality_gate,
    stream_events_windowed,
    stream_hourly_anomaly,
    stream_join_enrich,
    stream_join_remote_dim,
    stream_near_dedup,
    stream_remote_sink,
    stream_sliding_window,
    stream_stream_attribution,
    stream_trending_topk,
)
