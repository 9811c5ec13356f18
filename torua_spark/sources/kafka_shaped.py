"""Kafka-shaped streaming source facade (reference README.md:214-218 —
the documented production ingestion story; the one §2.C source family
this image cannot run natively, since no Kafka broker or connector jar
ships in the container).

Contract: every pipeline is written against **Spark's Kafka wire
schema** — ``key binary, value binary, topic string, partition int,
offset long, timestamp timestamp, timestampType int`` — exactly what
``spark.readStream.format("kafka")`` emits. Two constructors produce
that relation:

- ``kafka_stream``: the real connector, a one-line passthrough (needs
  the spark-sql-kafka jar + a broker; raises a clear error here).
- ``simulated_kafka_events``: the events table replayed through the
  FILE source and mapped onto the wire schema with DETERMINISTIC
  metadata, so the full pipeline (partitioner, JSON value
  serialization, parse, windowed agg) is oracle-checkable in this
  image and swaps to the real source with one constructor change.

Simulator semantics (all JVM-side Catalyst expressions, codegen'd):
- ``key``   = UTF-8 bytes of ``user_id`` (Kafka's partition-by-key).
- ``partition`` = FNV-1a32(key) % n_partitions — the engine's routing
  hash (functions/hashing.py, reference shard_registry.go:372-379)
  standing in for Kafka's murmur2 partitioner; same hash both engines,
  so the oracle recomputes placement exactly.
- ``offset`` = ``event_id`` — unique and monotone w.r.t. source order
  per (topic, partition), though not dense (real Kafka offsets are
  dense per partition; consumers may only rely on uniqueness +
  monotonicity, which the simulator honors).
- ``value`` = UTF-8 JSON of the full event with ``ts`` serialized as
  integer MICROSECONDS (``ts_us``) — exact round-trip, immune to
  session-timezone string formatting.
- ``timestampType`` = 0 (CreateTime).

Scale shape: the map onto/off the wire schema is a narrow projection
(no shuffle, no state); a production topic arrives already partitioned
so the simulator's post-source repartition models the deployment
shape. Aggregations downstream see ordinary columns and keep their
watermark/state semantics unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from torua_spark.functions.hashing import shard_for_key

KAFKA_FIELDS = [
    ("key", T.BinaryType()),
    ("value", T.BinaryType()),
    ("topic", T.StringType()),
    ("partition", T.IntegerType()),
    ("offset", T.LongType()),
    ("timestamp", T.TimestampType()),
    ("timestampType", T.IntegerType()),
]

KAFKA_SCHEMA = T.StructType([T.StructField(n, t) for n, t in KAFKA_FIELDS])

N_SIM_PARTITIONS = 8

# The JSON payload schema for simulated event values (ts as micros).
EVENT_VALUE_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts_us", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def kafka_stream(spark: SparkSession, topic: str, bootstrap_servers: str,
                 starting_offsets: str = "earliest", **options) -> DataFrame:
    """The REAL source: requires the spark-sql-kafka connector jar and
    a reachable broker (neither ships in this image). Kept as a thin
    passthrough so production deployments swap constructors, not
    pipelines."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - jar-less image
        raise RuntimeError(
            "Kafka connector unavailable (needs the spark-sql-kafka jar "
            "and a broker); use simulated_kafka_events for the "
            "oracle-checkable in-image twin"
        ) from exc


def to_kafka_shape(events: DataFrame, topic: str,
                   n_partitions: int = N_SIM_PARTITIONS) -> DataFrame:
    """Map normalized event rows onto the Kafka wire schema (works on
    both batch and streaming frames — the batch twin is what the
    oracle parity test replays)."""
    key_str = F.col("user_id").cast("string")
    payload = F.to_json(F.struct(
        F.col("event_id"),
        # exact integer micros — timezone-proof round-trip
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    ))
    return events.select(
        F.encode(key_str, "UTF-8").alias("key"),
        F.encode(payload, "UTF-8").alias("value"),
        F.lit(topic).alias("topic"),
        shard_for_key(key_str, n_partitions).alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )


def simulated_kafka_events(spark: SparkSession, sf_dir: str,
                           topic: str = "events",
                           n_partitions: int = N_SIM_PARTITIONS) -> DataFrame:
    """Events parquet replayed as a Kafka-shaped STREAM."""
    from torua_spark.streaming.windows import events_stream

    return to_kafka_shape(events_stream(spark, sf_dir), topic, n_partitions)


def parse_event_values(kafka: DataFrame) -> DataFrame:
    """Consumer side: decode the JSON value payload back into typed
    event columns, keeping the wire metadata (topic, partition,
    offset). The inverse of ``to_kafka_shape`` up to column order —
    round-trip equality is pinned in tests/test_streaming.py."""
    ev = F.from_json(F.col("value").cast("string"), EVENT_VALUE_SCHEMA)
    return kafka.withColumn("ev", ev).select(
        F.col("ev.event_id").alias("event_id"),
        F.timestamp_micros(F.col("ev.ts_us")).alias("ts"),
        F.col("ev.user_id").alias("user_id"),
        F.col("ev.event_type").alias("event_type"),
        F.col("ev.value").alias("value"),
        F.col("ev.props").alias("props"),
        "topic", "partition", "offset",
    )


def kafka_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-shape query: simulated Kafka topic -> JSON parse ->
    per (event_type, partition) aggregation, drained to batch. Proves
    the whole wire contract end-to-end: the FNV partitioner, the
    micros-JSON serialization, the consumer parse, and offset
    propagation — every column recomputable by the DuckDB oracle."""
    from torua_spark.functions.compat import round4
    from torua_spark.streaming.windows import drain_to_batch

    ev = parse_event_values(simulated_kafka_events(spark, sf_dir))
    agg = (
        ev.groupBy("event_type", "partition")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round4(F.sum("value")).alias("sum_value"),
            F.max("offset").alias("max_offset"),
        )
    )
    return drain_to_batch(agg)
