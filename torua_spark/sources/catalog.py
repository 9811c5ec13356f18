"""Source catalog: parquet tables + derived engine views.

The reference's storage is an in-memory ``map[string][]byte`` behind
HTTP (reference: internal/storage/store.go:232-242) with no file
formats. The engine's sources are columnar parquet scans — Catalyst
pushes filters and prunes columns into the scan, which is the 100 TB
design point (partitioned object-store parquet + predicate pushdown).

``kv_view`` models the reference's KV surface over the ``customer``
table (FIXTURES.md §2.1): key = c_name, value = mktsegment|acctbal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def spread_small_scan(df: DataFrame, parallelism: int | None = None
                      ) -> DataFrame:
    """Repartition a scan ONLY when it reads fewer partitions than
    the session parallelism. Toy-SF corpora are single ~MB parquet
    files -> one input partition, which serializes every downstream
    Arrow kernel / expression chain on one core (the r11
    pack_sequences_bpe finding: a 96-rule merge chain benched 2.3 s
    single-core vs ~0.1 s spread). At production scale the scan
    already splits by spark.sql.files.maxPartitionBytes, the guard is
    false, and NO extra full-corpus shuffle is added — an
    unconditional repartition here would be exactly the 100 TB
    anti-pattern this repo avoids."""
    sc = df.sparkSession.sparkContext
    p = parallelism or sc.defaultParallelism
    # .rdd here is PLAN METADATA only — getNumPartitions reads the
    # physical plan's partitioning without launching a job or moving
    # a row through Python; this is not the row-at-a-time .rdd path
    # the repo bans (there is no DataFrame-API equivalent for input
    # partition count)
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Constraint propagation infers isnotnull filters on join keys, which
    # duplicates expensive routing expressions (fnv1a32) into a second
    # full evaluation per row — measured 3-20x slowdowns on routing
    # joins. Correctness is unaffected by disabling it.
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    if name == "events":
        # events.ts arrives as either parquet TIMESTAMP(NANOS) (which
        # Spark 4 refuses by default — read nanos as long, truncate to
        # native microseconds in exact 64-bit integer space) or plain
        # TIMESTAMP(us)/NTZ. Normalize both to session-timezone
        # TimestampType (UTC session => identical wall-clock instants)
        # so every downstream window/unix_timestamp sees one type.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def kv_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV projection of customer: (key string, value string).

    Value formatting uses printf-style '%.2f' so the Spark string and
    the DuckDB oracle string agree exactly (FIXTURES.md §3 determinism).
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_name").alias("key"),
        F.concat_ws("|", F.col("c_mktsegment"), F.format_string("%.2f", F.col("c_acctbal"))).alias("value"),
    )


# The same view in DuckDB SQL — embedded as a CTE by oracle queries.
KV_VIEW_SQL = (
    "SELECT c_name AS key, "
    "concat(c_mktsegment, '|', printf('%.2f', c_acctbal)) AS value "
    "FROM customer"
)


def binary_kv_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV projection with a true ``BinaryType`` value column — the
    reference's actual value model (opaque ``[]byte``,
    store.go:51-103; "Accepts any byte sequence" cmd/node/main.go:
    536-539). The value is a 16-byte raw MD5 digest (bytes spanning
    the full 0-255 range, NOT valid UTF-8) followed by the UTF-8
    payload — variable length, genuinely binary."""
    c = load_table(spark, sf_dir, "customer")
    payload = F.concat_ws(
        "|", F.col("c_mktsegment"), F.format_string("%.2f", F.col("c_acctbal"))
    )
    return c.select(
        F.col("c_name").alias("key"),
        F.concat(F.unhex(F.md5(payload)), F.encode(payload, "UTF-8")).alias("value"),
    )


BINARY_KV_VIEW_SQL = (
    "SELECT c_name AS key, "
    "unhex(md5(concat(c_mktsegment, '|', printf('%.2f', c_acctbal)))) || "
    "encode(concat(c_mktsegment, '|', printf('%.2f', c_acctbal))) AS value "
    "FROM customer"
)
