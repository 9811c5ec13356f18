"""Declared streaming + multimodal queries.

`late_data_watermark` and `streaming_health_state` run REAL Structured
Streaming queries (file source -> memory sink, drained synchronously);
since the whole table arrives in one micro-batch the watermark drops
nothing and results are batch-equivalent, so both carry SQL oracles
(the batch-parity goldens from SURVEY §2.D).

`multimodal_features` exercises the Arrow-batched mapInPandas decode
plumbing; the fake decode is md5-derived so the oracle can recompute
it in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from torua_spark.operators.multimodal import (
    extract_features,
    resize_specs,
    to_media_table,
)
from torua_spark.sources.catalog import load_table
from torua_spark.streaming.dedup import streaming_distinct_users
from torua_spark.streaming.health_state import streaming_consecutive_failures
from torua_spark.streaming.windows import (
    late_data_tumbling,
    stream_static_enrich_agg,
    stream_stream_attribution,
    streaming_decontamination,
    streaming_sessions,
)


def q_late_data_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return late_data_tumbling(spark, sf_dir)


def q_streaming_health_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_consecutive_failures(spark, sf_dir)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(to_media_table(load_table(spark, sf_dir, "documents")))


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_specs(to_media_table(load_table(spark, sf_dir, "documents")))


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_distinct_users(spark, sf_dir)


QUERIES = {
    "late_data_watermark": q_late_data_watermark,
    "streaming_health_state": q_streaming_health_state,
    "multimodal_features": q_multimodal_features,
    "multimodal_resize": q_multimodal_resize,
    "streaming_dedup": q_streaming_dedup,
    "streaming_enriched_agg": stream_static_enrich_agg,
    "streaming_sessions": streaming_sessions,
    "streaming_attribution_join": stream_stream_attribution,
    "streaming_decontaminate": streaming_decontamination,
}

ORACLE = {
    "late_data_watermark": """
        SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S')
                   AS hour_start,
               event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2
    """,
    "streaming_health_state": """
        WITH probes AS (
            SELECT 'n' || (user_id % 8) AS node_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   CASE WHEN value < 50 THEN 1 ELSE 0 END AS fail
            FROM events WHERE event_type = 'error'
        ),
        w AS (
            SELECT node_id, fail,
                   row_number() OVER (PARTITION BY node_id ORDER BY ts, event_id) AS rn,
                   sum(fail) OVER (PARTITION BY node_id ORDER BY ts, event_id
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s3,
                   sum(fail) OVER (PARTITION BY node_id ORDER BY ts, event_id
                                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS s4
            FROM probes
        )
        SELECT node_id,
               CAST(sum(CASE WHEN s3 = 3 AND s4 = 3 AND rn >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS unhealthy_transitions,
               CAST(sum(fail) AS BIGINT) AS total_failures,
               count(*) AS total_probes
        FROM w GROUP BY node_id
    """,
    "streaming_dedup": """
        SELECT event_type, count(DISTINCT user_id) AS n_distinct_users
        FROM events GROUP BY event_type
    """,
    "streaming_enriched_agg": """
        SELECT e.event_type, n.n_name,
               count(*) AS n_events,
               floor((sum(e.value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_value
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY e.event_type, n.n_name
    """,
    "streaming_attribution_join": """
        SELECT c.user_id,
               strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
               strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
         AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 60 MINUTE
    """,
    "streaming_sessions": """
        WITH e AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
        ),
        lagged AS (
            SELECT user_id, ts, event_id,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM e
        ),
        flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN prev_ts IS NULL
                             OR (epoch_us(ts) - epoch_us(prev_ts)) >= 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM lagged
        ),
        sess AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(date_trunc('second', min(ts)), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(date_trunc('second', max(ts) + INTERVAL 30 MINUTE), '%Y-%m-%d %H:%M:%S')
                   AS session_end,
               count(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    "multimodal_resize": """
        WITH f AS (
            SELECT doc_id,
                   CAST(1 + h % 640 AS INTEGER) AS width,
                   CAST(1 + (h // 640) % 480 AS INTEGER) AS height
            FROM (
                SELECT doc_id, ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
                FROM documents
            )
        )
        SELECT doc_id, width, height,
               CAST(greatest(1, floor(width *
                   CASE WHEN greatest(width, height) > 224
                        THEN 224.0 / greatest(width, height) ELSE 1.0 END + 0.5)) AS INTEGER)
                   AS new_width,
               CAST(greatest(1, floor(height *
                   CASE WHEN greatest(width, height) > 224
                        THEN 224.0 / greatest(width, height) ELSE 1.0 END + 0.5)) AS INTEGER)
                   AS new_height,
               greatest(width, height) > 224 AS needs_resize
        FROM f
    """,
    "multimodal_features": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS digest,
               CAST(1 + h % 640 AS INTEGER) AS width,
               CAST(1 + (h // 640) % 480 AS INTEGER) AS height,
               'RGB' AS mode
        FROM (
            SELECT doc_id, text,
                   ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
            FROM documents
        )
    """,
}

# Same two-corpus collision oracle as the batch twin — the drained
# streaming result must hash-match it exactly.
from torua_spark.queries import rag_q as _rag_q  # noqa: E402

ORACLE["streaming_decontaminate"] = _rag_q.ORACLE["dedup_decontaminate_ngram"]


from torua_spark.streaming.windows import streaming_index_dedup  # noqa: E402

QUERIES["streaming_index_dedup"] = streaming_index_dedup
# the union of per-batch index probes == the from-scratch cross-corpus
# MinHash pass, so the same oracle applies verbatim
ORACLE["streaming_index_dedup"] = _rag_q.ORACLE["dedup_decontaminate"]


from torua_spark.functions.hashing import fnv1a32_sql  # noqa: E402
from torua_spark.sources.kafka_shaped import (  # noqa: E402
    N_SIM_PARTITIONS,
    kafka_events_agg,
)

QUERIES["streaming_kafka_events"] = kafka_events_agg
# The oracle recomputes the simulator's wire contract from the raw
# events table: the FNV-1a32 partitioner on the stringified key and
# the event_id-as-offset rule — so a drift in serialization, parse, or
# placement hash-fails, not just row-counts.
ORACLE["streaming_kafka_events"] = f"""
    SELECT event_type,
           CAST(({fnv1a32_sql("CAST(user_id AS VARCHAR)")}) % {N_SIM_PARTITIONS} AS INTEGER) AS partition,
           count(*)::BIGINT AS n_events,
           floor((sum(value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_value,
           max(event_id) AS max_offset
    FROM events GROUP BY 1, 2
"""


from torua_spark.streaming.windows import (  # noqa: E402
    DRIFT_REL_THRESHOLD,
    streaming_profile_drift,
)

QUERIES["streaming_profile_drift"] = streaming_profile_drift

# Batch-parity golden: same windowed stats + the same fully-rounded
# drift predicate (round4 avg, round4 baseline, round4 ratio) so both
# engines take the same branch at the threshold boundary.
ORACLE["streaming_profile_drift"] = f"""
    WITH base AS (
        SELECT floor((avg(value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS b
        FROM events
    ),
    w AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
               count(*) AS n_events,
               (count(*) - count(value))::BIGINT AS n_nulls,
               floor((avg(value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS avg_value,
               floor((min(value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS min_value,
               floor((max(value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS max_value
        FROM events GROUP BY 1
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           n_events, n_nulls, avg_value, min_value, max_value,
           floor((abs(avg_value - b) / abs(b)) * 10000.0 + 0.5 + 1e-9) / 10000.0
               > {DRIFT_REL_THRESHOLD} AS drift
    FROM w, base
"""


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from torua_spark.operators.multimodal import audio_probe

    return audio_probe(to_media_table(load_table(spark, sf_dir, "documents")))


QUERIES["multimodal_audio_probe"] = q_multimodal_audio

# Text payloads are never RIFF/WAVE, so every corpus row takes the
# documented md5-derived fake tier — which is exactly what makes the
# probe DuckDB-reproducible; the REAL tier (WAV header walk + PCM
# frame sampling) is pinned on hand-built fixtures in
# tests/test_multimodal_codec.py.
ORACLE["multimodal_audio_probe"] = """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           CAST(1 + h % 2 AS INTEGER) AS n_channels,
           CAST(CASE (h // 2) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
           CAST(16 AS INTEGER) AS bits,
           CAST(1 + h % 100000 AS BIGINT) AS n_frames,
           (h % 10000) / 10000.0 AS rms,
           FALSE AS is_real
    FROM (
        SELECT doc_id, text,
               ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        FROM documents
    )
"""


from torua_spark.streaming.heavy_hitters import (  # noqa: E402
    HH_CAPACITY,
    streaming_heavy_hitters,
)

QUERIES["streaming_heavy_hitters"] = streaming_heavy_hitters

# Tolerance oracle (the approx_stats contract): sketch contents are
# arrival-order-dependent, but the space-saving GUARANTEES are not —
# the oracle emits the exact stream length, the deterministic summary
# size (capacity, or the distinct count when smaller), and TRUE for
# every bound; the hash matches iff every sketch honored its bounds.
ORACLE["streaming_heavy_hitters"] = f"""
    SELECT event_type,
           count(*) AS n_events,
           CAST(least({HH_CAPACITY}, count(DISTINCT user_id)) AS BIGINT)
               AS n_candidates,
           TRUE AS est_is_upper_bound,
           TRUE AS est_minus_err_is_lower_bound,
           TRUE AS contains_all_heavy_hitters
    FROM events GROUP BY 1
"""


from torua_spark.streaming.windows import streaming_knn  # noqa: E402

QUERIES["streaming_knn"] = streaming_knn

# Streaming every corpus vector through the persisted index equals the
# batch self-kNN exactly — same codebook, same probe set, same
# tie-break — so the drained stream reuses vector_knn_join's oracle.
ORACLE["streaming_knn"] = _rag_q.ORACLE["vector_knn_join"]


from torua_spark.streaming.windows import streaming_quality_gate  # noqa: E402


def q_streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 streaming twin of text_quality_classifier: the ingest
    quality gate — every arriving document scored per micro-batch by
    the same frozen hashed-feature weights."""
    return streaming_quality_gate(
        spark, sf_dir, _rag_q._quality_weights(), _rag_q.QUALITY_BIAS
    )


QUERIES["streaming_quality_gate"] = q_streaming_quality_gate

# The gate is stateless per document, so streaming the corpus through
# it equals the batch classifier exactly — same literal-weight oracle.
ORACLE["streaming_quality_gate"] = _rag_q.ORACLE["text_quality_classifier"]


from torua_spark.streaming.windows import streaming_image_dedup  # noqa: E402

QUERIES["streaming_image_dedup"] = streaming_image_dedup

# Every doc streams exactly once against an index of the full media
# relation, each pair emitted when its smaller id streams — the
# drained union equals the batch dedup_image_phash pass exactly, so
# the streaming shape reuses its arithmetic (planted-PGM + fake-tier)
# oracle, the streaming_knn precedent.
ORACLE["streaming_image_dedup"] = _rag_q.ORACLE["dedup_image_phash"]


from torua_spark.streaming.windows import streaming_audio_dedup  # noqa: E402

QUERIES["streaming_audio_dedup"] = streaming_audio_dedup

# Same drained-union-equals-batch argument as streaming_image_dedup:
# every doc streams once against an index of the full media relation,
# each pair emitted when its smaller id streams, so the stream equals
# the batch dedup_audio_fingerprint pass and reuses its arithmetic
# (planted-WAV + md5 fake tier) oracle.
ORACLE["streaming_audio_dedup"] = _rag_q.ORACLE["dedup_audio_fingerprint"]


from torua_spark.streaming.windows import streaming_audio_spectral  # noqa: E402

QUERIES["streaming_audio_spectral"] = streaming_audio_spectral

# Same drained-union-equals-batch argument, SPECTRAL tier (r14): every
# doc streams once against an index of the spectral entry's media
# relation, each pair emitted when its smaller id streams, so the
# stream equals the batch dedup_audio_spectral pass and reuses its
# naive-DFT arithmetic oracle.
ORACLE["streaming_audio_spectral"] = _rag_q.ORACLE["dedup_audio_spectral"]


from torua_spark.streaming.windows import streaming_video_dedup  # noqa: E402

QUERIES["streaming_video_dedup"] = streaming_video_dedup

# Drained-union-equals-batch (r13): every doc streams once against a
# frame-hash index of the full media relation; the ordered join's
# left-side-smaller filter is "emit when the smaller CLIP streams"
# (clip id occupies the synthetic frame id's high bits), and the full
# frame-match count for a pair is available in that one batch, so the
# min-matching-frames gate is exact per emission. The stream equals
# the batch dedup_video_fingerprint pass and reuses its arithmetic
# (planted-TVID + md5 fake tier) oracle.
ORACLE["streaming_video_dedup"] = _rag_q.ORACLE["dedup_video_fingerprint"]
