"""Streaming operator entries (SURVEY.md §2.D).

Structured Streaming queries executed to completion over the bounded
events stream — convergence to the batch answer is the correctness
property, so they get full DuckDB oracles, not just rows-only checks.
"""

from __future__ import annotations

from ..streaming import (
    stream_corpus_mix_monitor,
    stream_decayed_popularity,
    stream_lang_entropy_monitor,
    stream_dedup_stateful,
    stream_doc_quality_gate,
    stream_events_windowed,
    stream_hourly_anomaly,
    stream_join_enrich,
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

QUERIES["stream_remote_sink"] = stream_remote_sink
# Bounded stream inserted into a remote table then read back: converges to
# the batch aggregate over events.
ORACLE["stream_remote_sink"] = """
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
"""

QUERIES["stream_join_enrich"] = stream_join_enrich
# Stream-static join is stateless; bounded input converges to the batch join.
ORACLE["stream_join_enrich"] = """
    SELECT n.n_name AS nation,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
"""

QUERIES["stream_sliding_window"] = stream_sliding_window
# Every event falls in exactly two 2h/1h-slide windows: the hour-truncated
# start and the one before it.
ORACLE["stream_sliding_window"] = """
    WITH expanded AS (
      SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
             event_type, value
      FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM expanded GROUP BY ws, event_type
"""

QUERIES["stream_dedup_stateful"] = stream_dedup_stateful
ORACLE["stream_dedup_stateful"] = """
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique_events
    FROM events GROUP BY event_type
"""

from ..streaming.stateful import stream_sessionize_stateful  # noqa: E402

QUERIES["stream_sessionize_stateful"] = stream_sessionize_stateful
# Sessions still open at stream end stay in state, so the stream output is
# batch sessionization minus each user's final session.
ORACLE["stream_sessionize_stateful"] = """
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    ),
    rolled AS (
      SELECT user_id, session_id,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             COUNT(*) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS session_value
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, session_start, n_events, session_value
    FROM rolled r
    WHERE session_id < (SELECT MAX(session_id) FROM rolled r2 WHERE r2.user_id = r.user_id)
"""


from .llm_data import _Duck as _D  # noqa: E402
from .llm_data import _sql_quality_filter as _qf  # noqa: E402
from .llm_data import _minhash_shingles as _mh_shingles  # noqa: E402
from .llm_data import _minhash_sigs as _mh_sigs  # noqa: E402
from .llm_data import _minhash_bands as _mh_bands  # noqa: E402

QUERIES["stream_doc_quality_gate"] = stream_doc_quality_gate
# Stateless per-doc gate + keyed rollup: bounded input converges to the
# batch Gopher filter's (lang, keep) aggregate.
ORACLE["stream_doc_quality_gate"] = f"""
    WITH q AS ({_qf(_D)})
    SELECT lang, CAST(keep AS BIGINT) AS keep,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM q GROUP BY lang, keep
"""


QUERIES["stream_stream_attribution"] = stream_stream_attribution
# Bounded stream-stream interval join converges to the batch interval
# join; the per-user rollup is a batch aggregate over the joined pairs.
ORACLE["stream_stream_attribution"] = """
    SELECT v.user_id, COUNT(*) AS n_attributed,
           COUNT(DISTINCT v.event_id) AS n_views_with_click
    FROM events v
    JOIN events c ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
    GROUP BY v.user_id
"""


QUERIES["stream_near_dedup"] = stream_near_dedup
# Bounded stream-static band join converges to the batch band join: for
# every arriving src0 doc, the distinct standing-corpus docs sharing at
# least one minhash LSH band.
ORACLE["stream_near_dedup"] = f"""
    WITH oldsh AS ({_mh_shingles(_D, "(SELECT * FROM documents WHERE source <> 'src0')")}),
    oldsig AS ({_mh_sigs(_D, 'oldsh')}),
    oldbands AS ({_mh_bands(_D, 'oldsig')}),
    newsh AS ({_mh_shingles(_D, "(SELECT * FROM documents WHERE source = 'src0')")}),
    newsig AS ({_mh_sigs(_D, 'newsh')}),
    newbands AS ({_mh_bands(_D, 'newsig')})
    SELECT n.doc_id,
           CAST(COUNT(DISTINCT o.doc_id) AS BIGINT) AS n_corpus_near_dups,
           CAST(CASE WHEN COUNT(o.doc_id) > 0 THEN 1 ELSE 0 END AS INT) AS maybe_near_dup
    FROM newbands n LEFT JOIN oldbands o ON n.band_key = o.band_key
    GROUP BY n.doc_id
"""


QUERIES["stream_join_remote_dim"] = stream_join_remote_dim
# Federated stream-static join: the dimension comes through the remote
# scan (sqlite mirror of the same parquet), so the bounded stream
# converges to the batch parquet join.
ORACLE["stream_join_remote_dim"] = """
    SELECT n.n_name AS nation,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           CAST(MAX(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS max_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
"""


QUERIES["stream_quantile_monitor"] = stream_quantile_monitor
# The streamed 256-bin histogram converges to the batch histogram, so the
# interpolated estimates and the exact audit match the batch spelling.
ORACLE["stream_quantile_monitor"] = """
    WITH hist AS (
      SELECT least((CAST(ROUND(value * 100) AS BIGINT) // 100), CAST(255 AS BIGINT)) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT bin, cnt,
             SUM(cnt) OVER (ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM hist
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
    qs AS (SELECT CAST(q AS DOUBLE) AS q
           FROM (SELECT unnest([0.5e0, 0.9e0, 0.99e0]) AS q) t),
    pick AS (
      SELECT qs.q, MIN(c.bin) AS bin
      FROM qs CROSS JOIN tot CROSS JOIN cum c
      WHERE c.cum >= qs.q * tot.n
      GROUP BY qs.q
    ),
    exact AS (
      SELECT quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5) AS p50,
             quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.9) AS p90,
             quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.99) AS p99
      FROM events
    )
    SELECT p.q,
           ROUND((c.bin * 100 + 100.0e0 * (p.q * t.n - (c.cum - c.cnt)) / c.cnt)
                 / 100, 4) AS est_value,
           ROUND(CASE WHEN p.q = 0.5e0 THEN e.p50
                      WHEN p.q = 0.9e0 THEN e.p90
                      ELSE e.p99 END / 100, 4) AS exact_value
    FROM pick p
    JOIN cum c ON c.bin = p.bin
    CROSS JOIN tot t CROSS JOIN exact e
    ORDER BY p.q
"""

QUERIES["stream_sketch_heavy_hitters"] = stream_sketch_heavy_hitters
# The streamed sketch converges to the batch sketch cell-for-cell, so the
# serving-layer estimates equal the batch count-min audit.
from .llm_data import _Duck as _D, _sql_countmin as _cm  # noqa: E402

ORACLE["stream_sketch_heavy_hitters"] = _cm(_D)

QUERIES["stream_trending_topk"] = stream_trending_topk
# Streaming hourly counts converge to the batch hourly counts on bounded
# input; the per-window top-3 rank (n_events DESC, event_type ASC) runs
# over the converged aggregate in both engines.
ORACLE["stream_trending_topk"] = """
    WITH agg AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n_events
      FROM events
      GROUP BY window_start, event_type
    ),
    ranked AS (
      SELECT window_start, event_type, n_events,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY window_start ORDER BY n_events DESC, event_type
             ) AS INT) AS rank
      FROM agg
    )
    SELECT window_start, event_type, n_events, rank
    FROM ranked WHERE rank <= 3
"""


QUERIES["stream_hourly_anomaly"] = stream_hourly_anomaly
# Streaming hourly rollup converges to the batch hourly counts; the
# z-score layer is the identical exact-sufficient-statistics aggregate in
# both engines (same spelling as the batch events_hourly_anomaly oracle,
# with hour_ts formatted by the streaming leg).
ORACLE["stream_hourly_anomaly"] = """
    WITH hourly AS (
      SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
             COUNT(*) AS c
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS nh,
             CAST(SUM(c) AS DOUBLE) AS s1,
             CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS DOUBLE) AS s2
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, h.hour_ts,
           CAST(h.c AS BIGINT) AS n_events,
           ROUND((CAST(h.c AS DOUBLE) - s1 / nh)
                 / sqrt(greatest(s2 / nh - (s1 / nh) * (s1 / nh), 0.000001e0)), 4) AS zscore
    FROM hourly h JOIN stats s ON h.event_type = s.event_type
    ORDER BY abs(ROUND((CAST(h.c AS DOUBLE) - s1 / nh)
                 / sqrt(greatest(s2 / nh - (s1 / nh) * (s1 / nh), 0.000001e0)), 4)) DESC,
             h.event_type, h.hour_ts
    LIMIT 20
"""


from .llm_data import _sql_corpus_mix as _mix  # noqa: E402

QUERIES["stream_corpus_mix_monitor"] = stream_corpus_mix_monitor
# Streaming per-(lang, source) census converges to the batch census on
# bounded input; the fraction/weight layer is the identical arithmetic in
# both engines, so the batch corpus_mix_report oracle is the oracle.
ORACLE["stream_corpus_mix_monitor"] = _mix(_D)


from .llm_data import _sql_pii_redact as _pii  # noqa: E402

QUERIES["stream_pii_gate"] = stream_pii_gate
# Stateless per-doc redaction + keyed rollup converges to the batch
# per-source PII aggregate (same template, source column included).
ORACLE["stream_pii_gate"] = f"""
    WITH p AS ({_pii(_D, with_source=True)})
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS n_emails,
           CAST(SUM(n_phones) AS BIGINT) AS n_phones,
           CAST(SUM(n_ips) AS BIGINT) AS n_ips
    FROM p GROUP BY source
"""


from ..streaming.stateful import stream_scd2_monitor  # noqa: E402

QUERIES["stream_scd2_monitor"] = stream_scd2_monitor
# The open (current) interval per user stays in state, so the stream output
# is the batch SCD2 history minus each user's current row.
ORACLE["stream_scd2_monitor"] = """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             event_id
      FROM events
    ),
    marked AS (
      SELECT user_id, event_type, ts,
             SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seg
      FROM seq
    ),
    segs AS (
      SELECT user_id, event_type AS state, seg,
             MIN(ts) AS seg_start, COUNT(*) AS n_events
      FROM marked GROUP BY user_id, event_type, seg
    ),
    hist AS (
      SELECT user_id, state, seg_start, n_events,
             LEAD(seg_start) OVER (PARTITION BY user_id ORDER BY seg) AS seg_end
      FROM segs
    )
    SELECT user_id, state,
           strftime(seg_start, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(seg_end, '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(n_events AS BIGINT) AS n_events
    FROM hist WHERE seg_end IS NOT NULL
"""


from ..streaming.events import stream_media_stats_monitor  # noqa: E402
from .llm_data import _sql_video_oracle as _vid_oracle  # noqa: E402

QUERIES["stream_media_stats_monitor"] = stream_media_stats_monitor
# Bounded stream converges to the per-source rollup of the batch video
# md5 math (multimodal_video_real's oracle grouped by source).
ORACLE["stream_media_stats_monitor"] = f"""
    WITH per_doc AS (
      SELECT d.source, v.sum_luma, v.motion
      FROM ({_vid_oracle(_D)}) v JOIN documents d ON d.doc_id = v.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(sum_luma) AS BIGINT) AS sum_luma,
           CAST(SUM(motion) AS BIGINT) AS sum_motion,
           ROUND(CAST(SUM(sum_luma) AS DOUBLE) / (COUNT(*) * 24.0e0), 6) AS mean_luma
    FROM per_doc GROUP BY source
"""


from ..streaming.events import stream_ab_monitor  # noqa: E402
from .relational import _ABTEST_SQL as _ab_sql  # noqa: E402

QUERIES["stream_ab_monitor"] = stream_ab_monitor
# Converges to the batch A/B readout on bounded input.
ORACLE["stream_ab_monitor"] = _ab_sql.format(
    bucket="CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 2) AS BIGINT) % 2"
)

from ..streaming.events import stream_drift_monitor  # noqa: E402
from ..streaming.events import DRIFT_PSI_SQL  # noqa: E402

QUERIES["stream_drift_monitor"] = stream_drift_monitor
# Converges to the batch PSI over the same fixed $50 grid and day split;
# the oracle reuses the streaming serving-layer SQL with the cube spelled
# directly over events.
ORACLE["stream_drift_monitor"] = DRIFT_PSI_SQL.format(
    cube="""
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_num,
             CASE WHEN value IS NULL THEN CAST(-1 AS BIGINT)
                  ELSE least(CAST(floor(value / 50.0e0) AS BIGINT), CAST(9 AS BIGINT))
             END AS vbin,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    """
)

from ..streaming.events import stream_funnel_latency  # noqa: E402

QUERIES["stream_funnel_latency"] = stream_funnel_latency
# Converges to the batch signup→purchase latency report (the
# events_funnel_latency oracle verbatim — same census semantics).
ORACLE["stream_funnel_latency"] = """
    WITH s AS (
      SELECT user_id, MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS s_sec
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS p_sec
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND CAST(floor(epoch(ts)) AS BIGINT) >= s.s_sec
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT s.user_id, CAST(p.p_sec - s.s_sec AS BIGINT) AS latency_sec
      FROM s JOIN p ON p.user_id = s.user_id
    ),
    ranked AS (
      SELECT latency_sec,
             ROW_NUMBER() OVER (ORDER BY latency_sec, user_id) AS rn,
             COUNT(*) OVER () AS nc
      FROM lat
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_signups FROM s)
    SELECT t.n_signups,
           CAST(MAX(r.nc) AS BIGINT) AS n_converted,
           ROUND(CAST(MAX(r.nc) AS DOUBLE) / t.n_signups, 6) AS conversion_rate,
           CAST(MAX(CASE WHEN r.rn = ((r.nc + 1) // 2)
                         THEN r.latency_sec END) AS BIGINT) AS p50_latency_sec,
           CAST(MAX(CASE WHEN r.rn = ((9 * r.nc + 9) // 10)
                         THEN r.latency_sec END) AS BIGINT) AS p90_latency_sec
    FROM ranked r CROSS JOIN tot t
    GROUP BY t.n_signups
"""

from ..streaming.events import stream_mad_anomaly  # noqa: E402
from .relational import _MAD_SQL  # noqa: E402

QUERIES["stream_mad_anomaly"] = stream_mad_anomaly
# Converges to the batch MAD detector (identical serving-layer SQL over
# the maintained hourly rollup).
ORACLE["stream_mad_anomaly"] = _MAD_SQL.format(
    hr="CAST(floor(epoch(ts)) AS BIGINT) // 3600", div="//"
)


QUERIES["stream_decayed_popularity"] = stream_decayed_popularity
# The stream maintains the (event_type, day) count grid; the decay/rank
# serving layer re-weights cells, which is exactly the per-event decayed
# sum (the weight depends only on the day). Converges to
# events_decayed_popularity, whose oracle this is.
ORACLE["stream_decayed_popularity"] = """
    WITH anchor AS (
      SELECT MAX(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS today FROM events
    ),
    weighted AS (
      SELECT e.event_type,
             CAST(ROUND(pow(2.0e0, -CAST(a.today - (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS DOUBLE) / 7.0e0), 9)
                  AS DECIMAL(28, 9)) AS w
      FROM events e CROSS JOIN anchor a
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(w) AS DOUBLE), 6) AS decayed_count,
           CAST(ROW_NUMBER() OVER (ORDER BY SUM(w) DESC, event_type) AS BIGINT)
             AS decayed_rank
    FROM weighted
    GROUP BY event_type
    ORDER BY decayed_rank
"""


QUERIES["stream_lang_entropy_monitor"] = stream_lang_entropy_monitor
# Maintained (source, lang) grid + the batch entropy layer: converges to
# doc_language_entropy_by_source (same oracle SQL, inlined because this
# module registers before llm_data).
ORACLE["stream_lang_entropy_monitor"] = """
    WITH cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source, lang
    ),
    tot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cells GROUP BY source
    ),
    terms AS (
      SELECT c.source,
             CAST(ROUND((CAST(c.c AS DOUBLE) / t.n)
                        * ln(CAST(c.c AS DOUBLE) / t.n), 9) AS DECIMAL(18, 9)) AS h,
             CAST(c.c AS DOUBLE) / t.n AS share
      FROM cells c JOIN tot t ON c.source = t.source
    )
    SELECT t.source,
           CAST(MAX(tt.n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(CAST(-SUM(t.h) AS DOUBLE), 6) AS lang_entropy,
           ROUND(MAX(t.share), 6) AS dominant_share
    FROM terms t JOIN tot tt ON t.source = tt.source
    GROUP BY t.source
    ORDER BY t.source
    """


QUERIES["stream_srm_monitor"] = stream_srm_monitor
# Converges to events_ab_srm_check (same oracle SQL, inlined — this
# module registers before relational.py).
ORACLE["stream_srm_monitor"] = """
    WITH per_user AS (
      SELECT user_id,
             CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 2) AS BIGINT) % 2 AS INT) AS variant
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM per_user GROUP BY variant
    ),
    wide AS (
      SELECT CAST(SUM(CASE WHEN variant = 0 THEN n_users ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN variant = 1 THEN n_users ELSE 0 END) AS BIGINT) AS n1
      FROM arms
    )
    SELECT n0 AS n_control, n1 AS n_treatment,
           ROUND(CAST(n0 AS DOUBLE) / (n0 + n1), 6) AS control_share,
           ROUND(CAST((n0 - n1) AS DOUBLE) * (n0 - n1) / (n0 + n1), 6) AS chi_square,
           CAST(CASE WHEN CAST((n0 - n1) AS DOUBLE) * (n0 - n1) / (n0 + n1) > 3.841e0
                     THEN 1 ELSE 0 END AS INT) AS srm_flag
    FROM wide
"""

from ..streaming import stream_theta_distinct_monitor  # noqa: E402
from .llm_data import _sql_hll_words as _hll_words  # noqa: E402

QUERIES["stream_theta_distinct_monitor"] = stream_theta_distinct_monitor
# KMV merge is order-insensitive, so the converged per-source state
# equals the batch sketch; the oracle recomputes it from the corpus.
ORACLE["stream_theta_distinct_monitor"] = f"""
    WITH src_words AS MATERIALIZED ({_hll_words(_D)}),
    hashed AS (
      SELECT source, CAST('0x' || substring(md5(w), 1, 13) AS BIGINT) AS h, w
      FROM src_words
    ),
    ranked AS (
      SELECT source, h,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, w) AS rn
      FROM hashed
    ),
    stats AS (
      SELECT source,
             CAST(MAX(rn) AS BIGINT) AS n_exact,
             MAX(CASE WHEN rn <= 64 THEN h END) AS theta
      FROM ranked GROUP BY source
    )
    SELECT source,
           CAST(LEAST(n_exact, 64) AS BIGINT) AS n_sampled,
           ROUND(CASE WHEN n_exact < 64 THEN CAST(n_exact AS DOUBLE)
                      ELSE 63 * 4503599627370496.0e0 / theta END, 4) AS est_distinct
    FROM stats
    ORDER BY source
"""


from .relational import _SPECTRAL_SQL as _SPECT  # noqa: E402

QUERIES["stream_spectral_monitor"] = stream_spectral_monitor
# Maintained hourly grid + the batch DFT layer: converges to
# events_spectral_peaks, whose oracle spelling this reuses.
ORACLE["stream_spectral_monitor"] = _SPECT.format(
    hour="CAST(floor(epoch(ts)) AS BIGINT) // 3600"
)


from ..streaming import stream_late_arrival_monitor  # noqa: E402
from .relational import _late_audit_oracle  # noqa: E402

QUERIES["stream_late_arrival_monitor"] = stream_late_arrival_monitor
# pure map-side stamping converges to the batch audit exactly
ORACLE["stream_late_arrival_monitor"] = _late_audit_oracle()

from ..streaming import stream_seasonal_baseline_monitor  # noqa: E402

QUERIES["stream_seasonal_baseline_monitor"] = stream_seasonal_baseline_monitor
# the stream-maintained hourly rollup converges to the batch hourly
# census; the hod profile layer is identical arithmetic in both engines
ORACLE["stream_seasonal_baseline_monitor"] = """
    WITH hourly AS (
      SELECT CAST(EXTRACT(hour FROM date_trunc('hour', ts)) AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY date_trunc('hour', ts)
    )
    SELECT hod,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(c) AS BIGINT) AS total_events,
           ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS baseline_mean,
           CAST(MIN(c) AS BIGINT) AS min_count,
           CAST(MAX(c) AS BIGINT) AS max_count,
           ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 6) AS max_dev_ratio,
           ROUND(CAST(MIN(c) AS DOUBLE) * COUNT(*) / SUM(c), 6) AS min_dev_ratio
    FROM hourly GROUP BY hod
    ORDER BY hod
"""

from ..streaming import stream_cusum_monitor  # noqa: E402
from .relational import _CUSUM_SQL  # noqa: E402

QUERIES["stream_cusum_monitor"] = stream_cusum_monitor
# the stream-maintained daily rollup converges to the batch daily
# census; the integer-scaled CUSUM layer is the batch operator's
ORACLE["stream_cusum_monitor"] = _CUSUM_SQL.format(
    day_num="CAST(floor(epoch(ts)) AS BIGINT) // 86400"
)

from ..streaming.events import stream_url_host_monitor  # noqa: E402
from .llm_data import _sql_url_census as _urlc  # noqa: E402

QUERIES["stream_url_host_monitor"] = stream_url_host_monitor
# Stateless canonicalization + keyed (host, canon_url) counts converge
# to the batch grp census on bounded input; the per-host collapse layer
# is the identical _url_census_tail, so the batch census oracle is the
# oracle.
ORACLE["stream_url_host_monitor"] = _urlc(_D)

from ..plans.llm_data import _sql_t_closeness as _tclose_sql  # noqa: E402
from ..streaming.events import stream_t_closeness_monitor  # noqa: E402

# Streaming t-closeness monitor (round-10): the maintained QI-cell
# census converges to the batch census on bounded input, so the batch
# privacy_t_closeness_audit SQL is the oracle verbatim.
QUERIES["stream_t_closeness_monitor"] = stream_t_closeness_monitor
ORACLE["stream_t_closeness_monitor"] = _tclose_sql(_D)
