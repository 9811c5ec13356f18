"""Declared temporal queries (B9) + DuckDB oracles.

Timestamps are compared as formatted strings at second granularity and
DuckDB casts its nanosecond timestamps to microsecond TIMESTAMP first,
so both engines order and bucket identical values (FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from torua_spark.operators import temporal as tmp
from torua_spark.sources.catalog import load_table


def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tmp.tumbling_user_hour(load_table(spark, sf_dir, "events"))


def q_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tmp.sliding_topk_event_types(load_table(spark, sf_dir, "events"), k=3)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tmp.session_windows(load_table(spark, sf_dir, "events"), gap_minutes=30)


QUERIES = {
    "temporal_tumbling": q_tumbling,
    "temporal_sliding_topk": q_sliding_topk,
    "temporal_sessionize": q_sessionize,
}

ORACLE = {
    "temporal_tumbling": """
        SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
               user_id, count(*) AS n_events, floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value
        FROM events GROUP BY 1, 2
    """,
    "temporal_sliding_topk": """
        WITH daily AS (
            SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT day, event_type, n, CAST(rank AS INTEGER) AS rank FROM (
            SELECT *, row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rank
            FROM daily
        ) WHERE rank <= 3
    """,
    "temporal_sessionize": """
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
                             OR (epoch(ts)::BIGINT - epoch(prev_ts)::BIGINT) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM lagged
        ),
        sess AS (
            SELECT user_id,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        ),
        per_session AS (
            SELECT user_id, session_id, count(*) AS n FROM sess GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_sessions, CAST(max(n) AS BIGINT) AS max_session_events
        FROM per_session GROUP BY user_id
    """,
}
