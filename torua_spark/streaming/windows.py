"""Structured Streaming event-time windows (reference B9 — temporal
queries; A21's 5s poll loop is the reference's only real "stream").

``late_data_tumbling`` runs a genuine Structured Streaming query over
the events parquet (file source -> watermark -> tumbling window ->
memory sink, driven synchronously with processAllAvailable). With the
whole table arriving as one batch the watermark drops nothing, so the
result is batch-equivalent and oracle-checkable — exactly the
"batch-parity golden" strategy SURVEY §2.D prescribes.

At scale the same plan runs unchanged against a Kafka source with the
watermark bounding state: Spark keeps one aggregation state row per
(window, event_type) and evicts below-watermark windows — state is
O(active windows), not O(stream).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),  # nanos-as-long (catalog contract)
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def late_data_tumbling(spark: SparkSession, sf_dir: str,
                       watermark: str = "10 minutes") -> DataFrame:
    """Declared `late_data_watermark`: streaming tumbling 1h window per
    event_type with a watermark, drained synchronously; returns the
    final materialized result as a batch DataFrame."""
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
        )
    )
    name = f"late_data_{uuid.uuid4().hex[:8]}"
    # A state store instance spins up per shuffle partition; for the
    # drained-batch pattern 8 is plenty (a production deployment sizes
    # this to keys/executor, set once at stream start).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # Materialize before the in-memory sink table goes away.
    out = spark.table(name)
    out = spark.createDataFrame(out.collect(), out.schema)
    return out
