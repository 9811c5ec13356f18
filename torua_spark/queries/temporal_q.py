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
               user_id, count(*) AS n_events, floor((avg(value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS avg_value
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
                             OR (epoch_us(ts) - epoch_us(prev_ts)) >= 1800000000
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


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (the streaming-capable operator) over
    events: per-user sessions with a 30-minute gap; output bounds as
    strings. Semantically identical to the lag+cumsum formulation the
    oracle computes — pinning Spark's built-in operator against an
    independent SQL implementation."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


QUERIES["temporal_session_window"] = q_session_window_native

# Oracle: sessions via lag+cumsum; session_end = last event ts + gap
# (Spark's session_window end is exclusive: last_ts + gap duration).
ORACLE["temporal_session_window"] = """
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
    ),
    lagged AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM e
    ),
    flagged AS (
        -- Spark merges an event into the session iff it starts strictly
        -- before last_ts + gap, at microsecond precision.
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
"""


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True sliding window (1 hour window, 30 minute slide): every
    event lands in exactly two windows. Native F.window with slide."""
    from pyspark.sql import functions as F
    from torua_spark.functions.compat import round4

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round4(F.avg("value")).alias("avg_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


QUERIES["temporal_sliding_window"] = q_sliding_window

# Each event belongs to windows starting at time_bucket(30m, ts) and
# 30 minutes before it — the exact expansion of a 1h/30m slide.
ORACLE["temporal_sliding_window"] = """
    WITH expanded AS (
        SELECT strftime(time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, value
        FROM events
        UNION ALL
        SELECT strftime(time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP))
                            - INTERVAL 30 MINUTE,
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, value
        FROM events
    )
    SELECT window_start, event_type, count(*) AS n_events,
           floor((avg(value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS avg_value
    FROM expanded GROUP BY 1, 2
"""


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup -> click -> purchase funnel (first-touch, strict
    ordering) — the MATCH_RECOGNIZE-shaped sequence pattern."""
    from torua_spark.operators.temporal import event_funnel

    return event_funnel(load_table(spark, sf_dir, "events"))


QUERIES["event_funnel"] = q_event_funnel

ORACLE["event_funnel"] = """
    WITH s0 AS (
        SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t0
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s1 AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t1
        FROM events e JOIN s0 ON e.user_id = s0.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s0.t0
        GROUP BY e.user_id
    ),
    s2 AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s1.t1
        GROUP BY e.user_id
    ),
    n AS (
        SELECT (SELECT count(*) FROM s0)::BIGINT AS n0,
               (SELECT count(*) FROM s1)::BIGINT AS n1,
               (SELECT count(*) FROM s2)::BIGINT AS n2
    )
    SELECT 0 AS stage, 'signup' AS event_type, n0 AS n_users,
           floor(1.0 * 10000.0 + 0.5 + 1e-9) / 10000.0 AS conversion FROM n
    UNION ALL
    SELECT 1, 'click', n1,
           floor((CASE WHEN n0 > 0 THEN n1::DOUBLE / n0 ELSE 0.0 END) * 10000.0 + 0.5 + 1e-9) / 10000.0 FROM n
    UNION ALL
    SELECT 2, 'purchase', n2,
           floor((CASE WHEN n1 > 0 THEN n2::DOUBLE / n1 ELSE 0.0 END) * 10000.0 + 0.5 + 1e-9) / 10000.0 FROM n
"""


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: events land in 1-day
    time chunks whose PARTIAL aggregates (count, sum) are what a
    deployment materializes incrementally; the serving query merges
    partials — never re-reading raw events. Correctness rests on the
    aggregates being algebraic (count/sum merge; avg = sum/count of
    merged partials, never avg-of-avgs) — which this query proves by
    matching the oracle's direct aggregation over the raw table.

    At 100 TB: chunks are parquet partitions written per ingest
    window; the merge step reads ~365 x |event_type| partial rows per
    year instead of the raw stream."""
    from pyspark.sql import functions as F
    from torua_spark.functions.compat import round4

    ev = load_table(spark, sf_dir, "events")
    chunks = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("chunk"), "event_type"
    ).agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("ps"))
    return chunks.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        round4(F.sum("ps")).alias("sum_value"),
        round4(F.sum("ps") / F.sum("pn")).alias("avg_value"),
    )


QUERIES["hypertable_rollup"] = q_hypertable_rollup


def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`hypertable_rollup`'s sibling for the aggregate that is NOT
    algebraic: distinct users. count/sum partials merge by addition;
    distinct counts don't — the mergeable form is a SKETCH partial.
    Each 1-day chunk materializes an HLL sketch of its user_ids (a
    fixed ~KB binary, what a deployment persists next to the
    count/sum partials); the serving query merges sketches with
    `hll_union_agg` — register-wise max, order-insensitive — and
    estimates, never re-reading raw events.

    Sketch estimates can't hash-match another engine, so the declared
    contract is the tolerance-oracle pattern (`approx_stats`): emit
    the chunk count and exact distinct (deterministic) plus a boolean
    pinning the merged estimate inside 5% of exact (default
    lgConfigK=12 -> ~1.6% rsd, so 5% ≈ 3 sigma); the oracle emits
    TRUE constants."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    chunks = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("chunk"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = chunks.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_chunks",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.col("exact_users") * F.lit(0.05)
        ).alias("users_within_5pct"),
    )


QUERIES["sketch_rollup"] = q_sketch_rollup


def q_temporal_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from torua_spark.operators.temporal import gapfill_hourly

    return gapfill_hourly(load_table(spark, sf_dir, "events"))


QUERIES["temporal_gapfill"] = q_temporal_gapfill

ORACLE["temporal_gapfill"] = """
    WITH counts AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS h0,
               date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS h1
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM span
    ),
    grid AS (
        SELECT h, event_type
        FROM spine, (SELECT DISTINCT event_type FROM events)
    )
    SELECT strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_start, g.event_type,
           coalesce(c.n, 0)::BIGINT AS n_events
    FROM grid g LEFT JOIN counts c ON g.h = c.h AND g.event_type = c.event_type
"""

ORACLE["sketch_rollup"] = """
    WITH n_chunks AS (
        SELECT event_type, count(*)::BIGINT AS n_chunks FROM (
            SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS chunk,
                   event_type
            FROM events
        ) GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users
        FROM events GROUP BY event_type
    )
    SELECT event_type, n_chunks, exact_users, TRUE AS users_within_5pct
    FROM exact JOIN n_chunks USING (event_type)
"""

ORACLE["hypertable_rollup"] = """
    WITH chunks AS (
        SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS chunk, event_type,
               count(*)::BIGINT AS pn, sum(value) AS ps
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, sum(pn)::BIGINT AS n_events,
           floor((sum(ps)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_value,
           floor((sum(ps) / sum(pn)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS avg_value
    FROM chunks GROUP BY event_type
"""


def q_temporal_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from torua_spark.operators.temporal import daily_trend

    return daily_trend(load_table(spark, sf_dir, "events"))


QUERIES["temporal_trend"] = q_temporal_trend

ORACLE["temporal_trend"] = """
    WITH day AS (
        SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
               event_type, count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n,
           floor((avg(n) OVER (PARTITION BY event_type ORDER BY day
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
                 * 10000.0 + 0.5 + 1e-9) / 10000.0 AS ma3,
           (n - lag(n) OVER (PARTITION BY event_type ORDER BY day))::BIGINT
               AS dod_delta,
           floor(((n - lag(n) OVER (PARTITION BY event_type ORDER BY day))::DOUBLE
                  / lag(n) OVER (PARTITION BY event_type ORDER BY day))
                 * 10000.0 + 0.5 + 1e-9) / 10000.0 AS pct_change
    FROM day
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention over the events table — first-seen-day
    cohorts x day offset, hash-checked including the ratio."""
    return tmp.retention_cohorts(load_table(spark, sf_dir, "events"))


QUERIES["retention_cohorts"] = q_retention_cohorts

ORACLE["retention_cohorts"] = """
    WITH f AS (
        SELECT user_id, date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS cohort
        FROM events GROUP BY 1
    ),
    a AS (
        SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS aday
        FROM events
    ),
    sizes AS (
        SELECT cohort, count(DISTINCT user_id) AS cohort_size FROM f GROUP BY 1
    ),
    grid AS (
        SELECT f.cohort,
               CAST(datediff('day', f.cohort, a.aday) AS BIGINT) AS day_offset,
               count(DISTINCT a.user_id) AS n_active
        FROM a JOIN f USING (user_id) GROUP BY 1, 2
    )
    SELECT strftime(g.cohort, '%Y-%m-%d') AS cohort_day,
           day_offset, CAST(n_active AS BIGINT) AS n_active,
           CAST(cohort_size AS BIGINT) AS cohort_size,
           floor((n_active::DOUBLE / cohort_size) * 10000.0 + 0.5 + 1e-9)
               / 10000.0 AS retention
    FROM grid g JOIN sizes USING (cohort)
"""


def q_temporal_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event_type — open/close tie-broken on
    (ts, event_id) so simultaneous events are deterministic."""
    return tmp.ohlc_bars(load_table(spark, sf_dir, "events"))


QUERIES["temporal_ohlc"] = q_temporal_ohlc

ORACLE["temporal_ohlc"] = """
    WITH e AS (
        SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
               CAST(ts AS TIMESTAMP) AS ts, event_id, value,
               row_number() OVER (
                   PARTITION BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
                   ORDER BY ts, event_id) AS rf,
               row_number() OVER (
                   PARTITION BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
                   ORDER BY ts DESC, event_id DESC) AS rl
        FROM events
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bar_start,
           floor((max(CASE WHEN rf = 1 THEN value END)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS open,
           floor((max(value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS high,
           floor((min(value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS low,
           floor((max(CASE WHEN rl = 1 THEN value END)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS close,
           count(*) AS volume
    FROM e GROUP BY 1, 2
"""
