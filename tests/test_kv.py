"""KV declared queries vs DuckDB oracle at sf0.001 + semantic edge cases."""

import pytest

from tests.oracle import compare
from torua_spark.operators import kv as kvops
from torua_spark.queries import kv_q
from torua_spark.sources.catalog import kv_view


@pytest.mark.parametrize("name", sorted(kv_q.QUERIES))
def test_kv_query_matches_oracle(spark, sf_dir, name):
    compare(kv_q.QUERIES[name](spark, sf_dir), kv_q.ORACLE[name], sf_dir)


def test_missing_key_is_empty(spark, sf_dir):
    assert kv_q.q_missing_key(spark, sf_dir).count() == 0


def test_upsert_last_writer_wins(spark, sf_dir):
    out = kv_q.q_upsert(spark, sf_dir)
    vals = {r["key"]: r["value"] for r in out.filter(out.key.isin(
        ["Customer#000000005", "user@example.com"])).collect()}
    assert vals["Customer#000000005"] == "UPDATED|1.00"
    assert vals["user@example.com"] == "NEW|3.00"


def test_delete_idempotent(spark, sf_dir):
    kv = kv_view(spark, sf_dir)
    tombs = spark.createDataFrame([("not-present-key",)], "key string")
    assert kvops.delete(kv, tombs).count() == kv.count()


def test_range_scan_sorted_halfopen(spark, sf_dir):
    rows = [r["key"] for r in kv_q.q_range_scan(spark, sf_dir).collect()]
    assert rows == sorted(rows)
    assert all(kv_q.RANGE_START <= k < kv_q.RANGE_END for k in rows)


def test_owns_key_partitions_match_routing(spark, sf_dir):
    """A11 — the node-side ownership predicate selects exactly the keys
    the coordinator routes to that shard."""
    from pyspark.sql import functions as F
    from torua_spark.functions.hashing import shard_for_key

    kv = kv_view(spark, sf_dir)
    for shard in range(4):
        owned = set(
            r["key"] for r in kv.filter(kvops.owns_key(4, shard)).select("key").collect()
        )
        routed = set(
            r["key"]
            for r in kv.select("key", shard_for_key("key").alias("s"))
            .filter(F.col("s") == shard)
            .collect()
        )
        assert owned == routed and owned


def test_scd2_intervals_chain_per_key(spark, sf_dir):
    """Each key's SCD2 rows form a gapless chain: exactly one open
    (current) row; every valid_to equals the next version's
    valid_from; versions are dense from 1."""
    from torua_spark.queries.kv_q import q_scd2_history

    by_key = {}
    for r in q_scd2_history(spark, sf_dir).collect():
        by_key.setdefault(r["key"], []).append(r)
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(1 for r in rows if r["is_current"]) == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"], key


def test_upsert_intra_batch_ties_deterministic(spark):
    """ADVICE r1: a batch repeating a key has no arrival order; the
    documented contract is greatest-value-wins. Must be stable across
    partitionings."""
    from torua_spark.operators import kv as kvops

    base = spark.createDataFrame([("a", "base")], "key string, value string")
    updates = spark.createDataFrame(
        [("a", "v1"), ("a", "v9"), ("a", "v5")], "key string, value string"
    )
    for parts in (1, 7):
        out = kvops.upsert(base, updates.repartition(parts)).collect()
        assert {(r["key"], r["value"]) for r in out} == {("a", "v9")}
