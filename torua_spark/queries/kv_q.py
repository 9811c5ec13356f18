"""Declared KV queries (SURVEY §2.D kv_*) + DuckDB oracles.

Parity targets: reference A1-A8 (store.go:297-490, shard.go:257-368,
573-630) exercised over the customer-backed KV view, with the same
fixtures the reference's BDD scenarios use (missing key => empty,
last-writer-wins upsert, idempotent delete, sorted [start,end) range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from torua_spark.operators import kv as kvops
from torua_spark.sources.catalog import KV_VIEW_SQL, kv_view
from torua_spark.sources.local import local_df

POINT_KEY = "Customer#000000042"
MULTI_KEYS = ["Customer#000000007", "Customer#000000013", "Customer#000000099", "no-such-key"]
MISSING_KEY = "definitely/missing key-数字"
UPSERTS = [
    ("Customer#000000005", "UPDATED|1.00"),
    ("Customer#000000007", "UPDATED|2.00"),
    ("user@example.com", "NEW|3.00"),
]
TOMBSTONES = ["Customer#000000010", "Customer#000000011", "not-present-key"]
RANGE_START, RANGE_END = "Customer#000000100", "Customer#000000200"


def _kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kv_view(spark, sf_dir)


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kvops.point_get(_kv(spark, sf_dir), POINT_KEY)


def q_multi_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kvops.multi_get(_kv(spark, sf_dir), MULTI_KEYS)


def q_missing_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kvops.point_get(_kv(spark, sf_dir), MISSING_KEY)


def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    updates = local_df(spark, UPSERTS, "key string, value string")
    return kvops.upsert(_kv(spark, sf_dir), updates)


def q_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    tombs = local_df(spark, [(k,) for k in TOMBSTONES], "key string")
    return kvops.delete(_kv(spark, sf_dir), tombs)


def q_list_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kvops.list_keys(_kv(spark, sf_dir))


def q_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kvops.range_scan(_kv(spark, sf_dir), RANGE_START, RANGE_END)


def q_delete_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kvops.delete_range(_kv(spark, sf_dir), RANGE_START, RANGE_END)


QUERIES = {
    "kv_point_lookup": q_point_lookup,
    "kv_multi_get": q_multi_get,
    "kv_missing_key": q_missing_key,
    "kv_upsert": q_upsert,
    "kv_delete": q_delete,
    "kv_list_keys": q_list_keys,
    "kv_range_scan": q_range_scan,
    "kv_delete_range": q_delete_range,
}

_MULTI_IN = ", ".join(f"'{k}'" for k in MULTI_KEYS)
_UPSERT_VALUES = ", ".join(f"('{k}', '{v}')" for k, v in UPSERTS)
_TOMB_IN = ", ".join(f"'{k}'" for k in TOMBSTONES)

ORACLE = {
    "kv_point_lookup": f"""
        WITH kv AS ({KV_VIEW_SQL})
        SELECT key, value FROM kv WHERE key = '{POINT_KEY}'
    """,
    "kv_multi_get": f"""
        WITH kv AS ({KV_VIEW_SQL})
        SELECT key, value FROM kv WHERE key IN ({_MULTI_IN})
    """,
    "kv_missing_key": f"""
        WITH kv AS ({KV_VIEW_SQL})
        SELECT key, value FROM kv WHERE key = '{MISSING_KEY}'
    """,
    "kv_upsert": f"""
        WITH kv AS ({KV_VIEW_SQL}),
        updates(key, value) AS (VALUES {_UPSERT_VALUES}),
        unioned AS (
            SELECT key, value, 0 AS _version FROM kv
            UNION ALL
            SELECT key, value, 1 AS _version FROM updates
        )
        SELECT key, value FROM (
            SELECT key, value,
                   row_number() OVER (PARTITION BY key ORDER BY _version DESC) AS _rn
            FROM unioned
        ) WHERE _rn = 1
    """,
    "kv_delete": f"""
        WITH kv AS ({KV_VIEW_SQL})
        SELECT key, value FROM kv WHERE key NOT IN ({_TOMB_IN})
    """,
    "kv_list_keys": f"""
        WITH kv AS ({KV_VIEW_SQL})
        SELECT key FROM kv
    """,
    "kv_range_scan": f"""
        WITH kv AS ({KV_VIEW_SQL})
        SELECT key FROM kv
        WHERE key >= '{RANGE_START}' AND key < '{RANGE_END}'
        ORDER BY key
    """,
    "kv_delete_range": f"""
        WITH kv AS ({KV_VIEW_SQL})
        SELECT key, value FROM kv
        WHERE NOT (key >= '{RANGE_START}' AND key < '{RANGE_END}')
    """,
}


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 extended to full write history: the purchase-event stream
    per user as an SCD2 table (valid_from/valid_to intervals, version
    numbers, open-ended current row)."""
    from pyspark.sql import functions as F
    from torua_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    updates = ev.select(
        F.col("user_id").cast("string").alias("key"),
        "value",
        "ts",
        F.col("event_id").alias("seq"),
    )
    return kvops.scd2_history(updates)


QUERIES["kv_scd2_history"] = q_scd2_history


def q_binary_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A7 over TRUE BinaryType values (VERDICT r1 #5): per-shard
    stats of the binary KV view — key count, total value BYTES
    (store.go:477-490 sums len(value) the same way), distinct value
    count, an FNV-1a content checksum over every value's hex image
    (any flipped byte anywhere changes the sum), and the min/max hex
    images. All JVM expressions; the checksum is partial+final
    aggregable — the shape that holds at 100 TB."""
    from pyspark.sql import functions as F

    from torua_spark.functions.hashing import fnv1a32, shard_for_key
    from torua_spark.sources.catalog import binary_kv_view

    bkv = binary_kv_view(spark, sf_dir)
    return (
        bkv.select(
            shard_for_key(F.col("key")).alias("shard_id"),
            "value",
            F.hex(F.col("value")).alias("hx"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.length("value")).alias("total_bytes"),
            F.countDistinct("value").alias("n_distinct"),
            F.sum(fnv1a32(F.col("hx"))).alias("fnv_checksum"),
            F.min("hx").alias("min_hex"),
            F.max("hx").alias("max_hex"),
        )
    )


QUERIES["kv_binary_values"] = q_binary_values

def _binary_oracle() -> str:
    from torua_spark.functions.hashing import fnv1a32_sql, shard_for_key_sql
    from torua_spark.sources.catalog import BINARY_KV_VIEW_SQL

    return f"""
        WITH bkv AS ({BINARY_KV_VIEW_SQL})
        SELECT {shard_for_key_sql("key")} AS shard_id,
               count(*)::BIGINT AS n_keys,
               sum(octet_length(value))::BIGINT AS total_bytes,
               count(DISTINCT value)::BIGINT AS n_distinct,
               sum({fnv1a32_sql("hex(value)")})::BIGINT AS fnv_checksum,
               min(hex(value)) AS min_hex,
               max(hex(value)) AS max_hex
        FROM bkv GROUP BY 1
    """


ORACLE["kv_binary_values"] = _binary_oracle()

ORACLE["kv_scd2_history"] = """
    SELECT user_id::VARCHAR AS key, value,
           CAST(ts AS TIMESTAMP) AS valid_from,
           lead(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
           CAST(row_number() OVER w AS INTEGER) AS version,
           (lead(CAST(ts AS TIMESTAMP)) OVER w IS NULL) AS is_current
    FROM events WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
"""


def q_shard_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding placement matrix (reference migrating-state handoff,
    internal/shard/doc.go:62-82, ARCHITECTURE.md:454-468): every key's
    (from_shard, to_shard) flow under the FNV contract when the shard
    count changes 4 -> 6, with per-flow counts and the FNV checksum a
    receiver re-verifies after handoff. The physical rewrite half of
    the story (hive `shard=` layout n -> m with the same checksums
    asserted end-to-end) is operators/migration.rewrite_sharded_table,
    exercised in tests/test_migration.py."""
    from torua_spark.operators.migration import migration_plan

    return migration_plan(_kv(spark, sf_dir))


QUERIES["shard_migration"] = q_shard_migration


def _migration_oracle() -> str:
    from torua_spark.functions.hashing import fnv1a32_sql
    from torua_spark.operators.migration import MIGRATION_TARGET_SHARDS
    from torua_spark.constants import NUM_SHARDS

    return f"""
        WITH kv AS ({KV_VIEW_SQL}),
        h AS (SELECT {fnv1a32_sql("key")} AS h FROM kv)
        SELECT CAST(h % {NUM_SHARDS} AS INTEGER) AS from_shard,
               CAST(h % {MIGRATION_TARGET_SHARDS} AS INTEGER) AS to_shard,
               count(*)::BIGINT AS n_keys,
               CAST(bit_xor(h) AS BIGINT) AS keys_checksum,
               CAST(h % {NUM_SHARDS} AS INTEGER) != CAST(h % {MIGRATION_TARGET_SHARDS} AS INTEGER) AS moved
        FROM h GROUP BY 1, 2
    """


ORACLE["shard_migration"] = _migration_oracle()
