"""Temporal operators (reference B9 — "temporal graph analysis ...
execute temporal queries in parallel, aggregate at coordinator",
README.md:214-218).

Batch event-time windowing over the events table. The tumbling window
uses Spark's native ``window()`` expression (the same operator the
streaming variant uses with a watermark); sliding top-k is a rank
window over day buckets.

Determinism: window starts are emitted as formatted strings so the
DuckDB oracle comparison is type- and timezone-unambiguous
(FIXTURES.md §3); ties in top-k rank are broken by event_type.

Scale: tumbling agg is partial+final on (user, hour) — fully
map-combined; top-k is one shuffle on the day bucket with a
whole-stage-codegen rank; no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from torua_spark.functions.compat import round4

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_user_hour(events: DataFrame) -> DataFrame:
    """Declared `temporal_tumbling` — events per user per 1-hour
    tumbling window with avg(value)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round4(F.avg("value")).alias("avg_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("hour_start"),
            "user_id",
            "n_events",
            "avg_value",
        )
    )


def sliding_topk_event_types(events: DataFrame, k: int = 3) -> DataFrame:
    """Declared `temporal_sliding_topk` — top-k event_types per day by
    count; rank window with deterministic event_type tiebreak."""
    daily = (
        events.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("day").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        daily.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("day", "event_type", "n", "rank")
    )


def session_windows(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization — classic lag+cumsum session assignment (the
    batch equivalent of streaming session_window): a new session starts
    when the gap to the previous event of the same user exceeds
    ``gap_minutes``. Output: per-user session count and max session
    length (events per session).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lit(gap_minutes * 60)
    sessions = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | ((F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")) > gap)
            ).cast("long"),
        )
        .withColumn("session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n").alias("max_session_events"),
    )
