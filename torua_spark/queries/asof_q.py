"""Declared as-of / range-join queries, verified against DuckDB's
NATIVE ASOF JOIN and inequality joins — the strongest form of oracle:
a from-scratch Spark implementation matching another engine's
built-in operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from torua_spark.operators.asof import asof_join, range_join_bucketized
from torua_spark.sources.catalog import load_table
from torua_spark.sources.local import local_df

# Inline interval fixture for the range join: seven 36-hour windows
# tiling January 2024 with gaps (events span 2024-01-01..01-30).
INTERVALS = [
    ("w0", "2024-01-01 00:00:00", "2024-01-02 12:00:00"),
    ("w1", "2024-01-04 06:00:00", "2024-01-05 18:00:00"),
    ("w2", "2024-01-08 00:00:00", "2024-01-09 12:00:00"),
    ("w3", "2024-01-12 18:00:00", "2024-01-14 06:00:00"),
    ("w4", "2024-01-17 00:00:00", "2024-01-18 12:00:00"),
    ("w5", "2024-01-22 06:00:00", "2024-01-23 18:00:00"),
    ("w6", "2024-01-28 00:00:00", "2024-01-29 12:00:00"),
]


def q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the user's most recent order date at event time
    (inclusive). Emitted as string; NULL when the user had no order yet."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
    )
    out = asof_join(ev, orders, on="user_id", left_ts="ts",
                    right_ts="o_orderdate", payload="o_orderdate")
    return out.select(
        "event_id", "user_id",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_order_date"),
    )


def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per maintenance window: bucketized interval join, grouped."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    iv = local_df(spark, INTERVALS, "w string, start_s string, end_s string").select(
        "w",
        F.col("start_s").cast("timestamp").alias("start"),
        F.col("end_s").cast("timestamp").alias("end"),
    )
    joined = range_join_bucketized(ev, iv, "ts", "start", "end", bucket_seconds=21600)
    from torua_spark.functions.compat import round4

    return joined.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_events"),
        round4(F.sum("value")).alias("sum_value"),
    )


NEXT_ORDER_TOLERANCE_DAYS = 7


def q_asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: for each event, the user's NEXT
    order date (>= event time) but only within 7 days — the
    time-to-conversion attribution shape (pandas merge_asof
    direction='forward', tolerance=7d)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
    )
    out = asof_join(
        ev, orders, on="user_id", left_ts="ts", right_ts="o_orderdate",
        payload="o_orderdate", direction="forward",
        tolerance_seconds=NEXT_ORDER_TOLERANCE_DAYS * 86400,
    )
    return out.select(
        "event_id", "user_id",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("next_order_date"),
    )


QUERIES = {
    "asof_latest_order": q_asof_latest_order,
    "asof_next_order": q_asof_next_order,
    "range_join_events": q_range_join_events,
}

_IV_VALUES = ", ".join(
    f"('{w}', TIMESTAMP '{s}', TIMESTAMP '{e}')" for w, s, e in INTERVALS
)

ORACLE = {
    "asof_latest_order": """
        SELECT e.event_id, e.user_id,
               strftime(o.o_orderdate, '%Y-%m-%d') AS last_order_date
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    # Native forward ASOF; tolerance applied to the matched row's gap
    # (the match is still the nearest — merge_asof semantics).
    "asof_next_order": f"""
        SELECT event_id, user_id,
               CASE WHEN o_orderdate IS NOT NULL
                         AND epoch_us(o_orderdate) - epoch_us(ts)
                             <= {NEXT_ORDER_TOLERANCE_DAYS * 86400} * 1000000::BIGINT
                    THEN strftime(o_orderdate, '%Y-%m-%d') END AS next_order_date
        FROM (
            SELECT e.event_id, e.user_id, e.ts, o.o_orderdate
            FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
            ASOF LEFT JOIN orders o
              ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
        )
    """,
    "range_join_events": f"""
        WITH iv(w, start, "end") AS (VALUES {_IV_VALUES})
        SELECT iv.w, count(*) AS n_events,
               floor((sum(e.value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_value
        FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events) e
        JOIN iv ON e.ts >= iv.start AND e.ts < iv."end"
        GROUP BY iv.w
    """,
}
