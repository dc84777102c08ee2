from .stateful import (  # noqa: F401
    stream_theta_distinct_monitor,
)
from .events import (  # noqa: F401
    stream_corpus_mix_monitor,
    stream_decayed_popularity,
    stream_dedup_stateful,
    stream_doc_quality_gate,
    stream_events_windowed,
    stream_hourly_anomaly,
    stream_join_enrich,
    stream_lang_entropy_monitor,
    stream_join_remote_dim,
    stream_near_dedup,
    stream_pii_gate,
    stream_remote_sink,
    stream_sliding_window,
    stream_spectral_monitor,
    stream_srm_monitor,
    stream_stream_attribution,
    stream_quantile_monitor,
    stream_sketch_heavy_hitters,
    stream_trending_topk,
)
