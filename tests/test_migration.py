"""Shard migration: placement matrix vs DuckDB oracle + the physical
n->m rewrite recipe (reference migrating-state handoff,
internal/shard/doc.go:62-82, ARCHITECTURE.md:454-468)."""

from pyspark.sql import functions as F

from tests.oracle import compare
from torua_spark.functions.hashing import shard_for_key
from torua_spark.operators.migration import (
    MIGRATION_TARGET_SHARDS,
    migration_plan,
    rewrite_sharded_table,
)
from torua_spark.queries import kv_q
from torua_spark.sources.catalog import kv_view


def test_shard_migration_matches_oracle(spark, sf_dir):
    compare(
        kv_q.QUERIES["shard_migration"](spark, sf_dir),
        kv_q.ORACLE["shard_migration"],
        sf_dir,
    )


def test_migration_plan_partitions_keyspace(spark, sf_dir):
    """Flows partition the keyspace: n_keys sums to the corpus, every
    (from, to) pair is in range, and the diagonal flows are unmoved."""
    kv = kv_view(spark, sf_dir)
    plan = migration_plan(kv).collect()
    assert sum(r["n_keys"] for r in plan) == kv.count()
    for r in plan:
        assert 0 <= r["from_shard"] < 4
        assert 0 <= r["to_shard"] < MIGRATION_TARGET_SHARDS
        assert r["moved"] == (r["from_shard"] != r["to_shard"])


def test_rewrite_sharded_table_roundtrip(spark, sf_dir, tmp_path):
    """The physical rewrite preserves count + checksums, places every
    row in its routed shard directory, and the new layout actually
    partition-prunes (shard= is a hive partition column)."""
    kv = kv_view(spark, sf_dir)
    report = rewrite_sharded_table(spark, kv, str(tmp_path)).collect()[0]
    assert report["n_rows"] == kv.count()
    assert report["misplaced"] == 0

    out = spark.read.parquet(f"{tmp_path}/shards_n{MIGRATION_TARGET_SHARDS}")
    # Ownership predicate holds row-by-row in the new layout.
    assert (
        out.filter(
            F.col("shard") != shard_for_key("key", MIGRATION_TARGET_SHARDS)
        ).count()
        == 0
    )
    # One shard's directory holds exactly that shard's keys.
    one = spark.read.parquet(
        f"{tmp_path}/shards_n{MIGRATION_TARGET_SHARDS}/shard=0"
    )
    expect = out.filter(F.col("shard") == 0).count()
    assert one.count() == expect > 0
    # The pruned read's plan touches ONE partition directory.
    pruned = out.filter(F.col("shard") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "shard" in plan
