"""Shard migration — the reference's resharding data movement.

The reference documents a ``migrating`` shard state with key handoff
between nodes (internal/shard/doc.go:62-82, ARCHITECTURE.md:454-468):
when the shard count changes, every key whose ``fnv1a32(key) % n``
placement differs under ``% m`` must move, and the move must be
provably lossless. Here that becomes two pieces:

- ``migration_plan``: the *placement-equality query* — one pass over
  the keyspace computing (from_shard, to_shard) under the FNV contract
  with per-flow counts and an order-insensitive FNV checksum. This is
  the matrix a coordinator schedules handoffs from, and the artifact
  both engines (Spark and the DuckDB oracle) can hash-compare.
- ``rewrite_sharded_table``: the *physical recipe* — rewrite a
  ``shard=`` hive-partitioned KV table from n to m shards with
  count/checksum-preserving assertions, the batch analog of the
  reference's per-key handoff loop.

Scale (100 TB): the plan is one partial+final aggregate keyed on the
(from, to) pair — at most n*m groups, no skew possible beyond key
distribution itself. The rewrite is ONE shuffle on the new shard id
(data movement IS the operation; nothing cheaper exists) followed by a
hive-partitioned write, so each new shard lands as its own directory
and every post-migration point read prunes to one directory. With
``bucketBy(m, key)`` + ``saveAsTable`` the same plan also pre-sorts
for shuffle-free key joins; the hive layout is used here because it
round-trips through plain ``spark.read.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from torua_spark.constants import NUM_SHARDS
from torua_spark.functions.hashing import fnv1a32, shard_for_key

MIGRATION_TARGET_SHARDS = 6  # non-divisor of 4: every flow shape occurs


def migration_plan(kv: DataFrame, from_shards: int = NUM_SHARDS,
                   to_shards: int = MIGRATION_TARGET_SHARDS) -> DataFrame:
    """Per-(from_shard, to_shard) movement matrix under the FNV
    routing contract: key count, whether the flow actually moves, and
    an order-insensitive checksum (XOR-fold of the 32-bit FNV hashes —
    exact at ANY key count, unlike a BIGINT sum which silently wraps
    past ~2^31 keys while a HUGEINT-summing verifier errors; ADVICE
    r5) that the post-move verifier re-computes per received shard.
    Caveat shared with any XOR checksum: duplicate keys cancel
    pairwise — sound here because a KV store's keyspace is unique by
    contract (store.go upsert semantics). The FNV hash is evaluated
    ONCE per key and reused for both placements — same single-scan
    shape at any corpus size."""
    h = kv.select(fnv1a32("key").alias("h"))
    return (
        h.groupBy(
            F.pmod(F.col("h"), F.lit(from_shards)).cast("int").alias("from_shard"),
            F.pmod(F.col("h"), F.lit(to_shards)).cast("int").alias("to_shard"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.bit_xor("h").alias("keys_checksum"),
        )
        .withColumn("moved", F.col("from_shard") != F.col("to_shard"))
    )


def rewrite_sharded_table(
    spark: SparkSession,
    kv: DataFrame,
    base_path: str,
    from_shards: int = NUM_SHARDS,
    to_shards: int = MIGRATION_TARGET_SHARDS,
) -> DataFrame:
    """End-to-end resharding recipe with integrity proof.

    1. Land ``kv`` as a ``shard=`` hive-partitioned table under the
       OLD placement (``fnv1a32(key) % from_shards``).
    2. Re-read it, recompute the NEW placement, shuffle once on the
       new shard id, write the ``shard=`` layout at ``to_shards``.
    3. Verify: row count and global FNV key-checksum and value
       checksum unchanged, and every row in the new layout satisfies
       the ownership predicate (its directory == its key's routed
       shard — the reference's shard.go ownership check applied to
       files instead of RPCs).

    Returns the one-row verification report; raises AssertionError on
    any integrity violation (the caller keeps the old layout in that
    case — both layouts are separate directories, so the migration is
    all-or-nothing like the reference's state-machine handoff)."""
    src = f"{base_path}/shards_n{from_shards}"
    dst = f"{base_path}/shards_n{to_shards}"

    old = kv.withColumn("shard", shard_for_key("key", from_shards))
    old.write.mode("overwrite").partitionBy("shard").parquet(src)

    def _summary(df: DataFrame) -> tuple[int, int, int]:
        r = df.select(
            F.count(F.lit(1)).alias("n"),
            # XOR-fold, not sum: exact at any row count (no BIGINT
            # wrap past 2^31 keys) and order-insensitive. Values may
            # repeat across keys, so the value checksum folds the
            # (key, value) PAIR hash — unique per row by the key-
            # uniqueness contract, so no pairwise cancellation.
            F.bit_xor(fnv1a32("key")).alias("kc"),
            F.bit_xor(fnv1a32(F.concat_ws("\x00", "key", "value"))).alias("vc"),
        ).collect()[0]
        return r["n"], r["kc"], r["vc"]

    landed = spark.read.parquet(src)
    n0, kc0, vc0 = _summary(landed)

    moved = (
        landed.select("key", "value")
        .withColumn("shard", shard_for_key("key", to_shards))
        .repartition(to_shards, "shard")
    )
    moved.write.mode("overwrite").partitionBy("shard").parquet(dst)

    out = spark.read.parquet(dst)
    n1, kc1, vc1 = _summary(out)
    misplaced = out.filter(
        F.col("shard") != shard_for_key("key", to_shards)
    ).count()

    assert n1 == n0, f"row count changed in migration: {n0} -> {n1}"
    assert kc1 == kc0, f"key checksum changed: {kc0} -> {kc1}"
    assert vc1 == vc0, f"value checksum changed: {vc0} -> {vc1}"
    assert misplaced == 0, f"{misplaced} rows in a shard they don't route to"

    from torua_spark.sources.local import local_df

    return local_df(
        spark,
        [(from_shards, to_shards, n1, kc1, vc1, misplaced)],
        "from_shards int, to_shards int, n_rows long, "
        "keys_checksum long, values_checksum long, misplaced long",
    )
