"""ToruaEngine facade: the reference's BDD scenarios
(features/distributed-storage.feature) replayed against the Python API,
plus the shard-partitioned at-rest layout with partition-pruned reads.
"""

from pyspark.sql import functions as F

from torua_spark.constants import FNV_MOD, FNV_OFFSET_BASIS, FNV_PRIME
from torua_spark.engine import ToruaEngine
from torua_spark.plans import plan_string


def fnv_py(s: str) -> int:
    h = FNV_OFFSET_BASIS
    for b in s.encode("utf-8"):
        h = ((h ^ b) * FNV_PRIME) % FNV_MOD
    return h


def test_crud_scenarios(spark):
    """Store/retrieve, update, delete, 404 — the core BDD scenarios."""
    e = ToruaEngine(spark)
    e.put("simple", "v1").put("user@example.com", "v2").put("数字", "unicode-value")
    assert e.get("simple") == "v1"
    assert e.get("user@example.com") == "v2"
    assert e.get("数字") == "unicode-value"
    assert e.get("missing") is None            # 404
    e.put("simple", "v1-updated")              # overwrite
    assert e.get("simple") == "v1-updated"
    e.delete("simple")
    assert e.get("simple") is None
    e.delete("simple")                         # idempotent
    assert sorted(e.scan("a", "z")) == ["user@example.com"]


def test_routing_matches_reference_hash(spark):
    e = ToruaEngine(spark)
    for key in ["simple", "path/to/resource", "数字"]:
        shard, node = e.route(key)
        assert shard == fnv_py(key) % 4
        assert node == ("n1" if shard % 2 == 0 else "n2")


def test_empty_value_and_large_value(spark):
    """BDD: empty values valid; >1MB values round-trip."""
    e = ToruaEngine(spark)
    big = "x" * (1024 * 1024 + 17)
    e.put_many([("empty", ""), ("big", big)])
    assert e.get("empty") == ""
    got = e.get("big")
    assert got is not None and len(got) == len(big)


def test_checkpoint_partition_prunes(spark, tmp_path):
    """At-rest layout: shard-partitioned parquet; a point lookup with
    the routing predicate prunes to ONE shard directory — the batch
    analog of coordinator routing."""
    e = ToruaEngine(spark)
    e.put_many([(f"key-{i}", f"v{i}") for i in range(200)])
    path = str(tmp_path / "kvstate")
    e.checkpoint_to(path)

    key = "key-42"
    shard = fnv_py(key) % 4
    df = (
        spark.read.parquet(path)
        .filter((F.col("shard_id") == shard) & (F.col("key") == key))
    )
    plan = plan_string(df)
    assert "PartitionFilters" in plan and "shard_id" in plan, plan
    assert [r["value"] for r in df.collect()] == ["v42"]

    restored = ToruaEngine.restore_from(spark, path)
    assert restored.get("key-42") == "v42"
    assert sorted(restored.list_keys()) == sorted(f"key-{i}" for i in range(200))


def test_shard_hint_scoped_reads(spark, tmp_path):
    """Query-message ``shard_hint`` (ARCHITECTURE.md:327-339): scan and
    list_keys scoped to hinted shards return exactly the keys those
    shards own. On a freshly-restored engine the hint filters the
    PARTITION column and Spark prunes to the hinted directories
    (PartitionFilters); after a mutation the at-rest view is invalid
    and the routing predicate takes over — same result set."""
    keys = [f"key-{i}" for i in range(120)]
    e = ToruaEngine(spark)
    e.put_many([(k, f"v{k}") for k in keys])
    hint = [1, 3]
    want = sorted(k for k in keys if fnv_py(k) % 4 in hint)
    # in-memory engine: routing-predicate path
    assert sorted(e.list_keys(shard_hint=hint)) == want
    assert e.scan("key-", "key-z", shard_hint=hint) == want
    # restored engine: partition-column path, directory-pruned
    path = str(tmp_path / "kvstate")
    e.checkpoint_to(path)
    r = ToruaEngine.restore_from(spark, path)
    hinted = r._hinted(hint)
    plan = plan_string(hinted)
    assert "PartitionFilters" in plan and "shard_id" in plan, plan
    assert sorted(r.list_keys(shard_hint=hint)) == want
    assert r.scan("key-", "key-z", shard_hint=hint) == want
    # single-shard form still works and agrees with the ownership set
    one = sorted(k for k in keys if fnv_py(k) % 4 == 2)
    assert sorted(r.list_keys(shard_id=2)) == one
    # a mutation invalidates the at-rest view but not correctness
    r.put("key-extra", "v")
    want2 = sorted(
        k for k in keys + ["key-extra"] if fnv_py(k) % 4 in hint
    )
    assert sorted(r.list_keys(shard_hint=hint)) == want2


def test_checkpoint_restore_roundtrips_file_uri(spark, tmp_path):
    """r8 ADVICE: checkpoint_to writes the sidecar for file:// URIs,
    so restore_from must strip the scheme the same way — the
    round-trip keeps the sidecar's num_shards inference and the
    at-rest pruning view instead of silently degrading."""
    e = ToruaEngine(spark, num_shards=6)
    e.put_many([(f"key-{i}", f"v{i}") for i in range(40)])
    uri = f"file://{tmp_path / 'kvuri'}"
    e.checkpoint_to(uri)
    r = ToruaEngine.restore_from(spark, uri)
    assert r.num_shards == 6
    assert r._at_rest is not None
    assert r.get("key-7") == "v7"


def test_restore_guards_stale_or_foreign_at_rest(spark, tmp_path):
    """Review findings (r8): the at-rest partition view must never
    serve a shard_hint under a DIFFERENT sharding than the engine's
    routing — a 4-shard checkpoint restored as num_shards=8 falls back
    to the routing predicate (correct ownership sets), and foreign
    (key,value) parquet without shard_id/sidecar never crashes a
    hinted read. num_shards defaults from the checkpoint sidecar."""
    keys = [f"key-{i}" for i in range(60)]
    e = ToruaEngine(spark, num_shards=4)
    e.put_many([(k, "v") for k in keys])
    path = str(tmp_path / "kv4")
    e.checkpoint_to(path)
    # default restore picks num_shards=4 from the sidecar, prunes
    r = ToruaEngine.restore_from(spark, path)
    assert r.num_shards == 4 and r._at_rest is not None
    # explicit override to 8: stale layout disabled, routing takes over
    r8 = ToruaEngine.restore_from(spark, path, num_shards=8)
    assert r8._at_rest is None
    want8 = sorted(k for k in keys if fnv_py(k) % 8 == 6)
    assert sorted(r8.list_keys(shard_hint=[6])) == want8
    # foreign parquet (no shard_id, no sidecar): hint still answers
    foreign = str(tmp_path / "foreign")
    spark.createDataFrame(
        [(k, "v") for k in keys], "key string, value string"
    ).write.parquet(foreign)
    rf = ToruaEngine.restore_from(spark, foreign)
    assert rf._at_rest is None
    want = sorted(k for k in keys if fnv_py(k) % 4 in (1, 3))
    assert sorted(rf.list_keys(shard_hint=[1, 3])) == want
    # conflicting scopes raise instead of silently dropping one
    import pytest as _pytest

    with _pytest.raises(ValueError, match="conflicting"):
        r.list_keys(shard_id=2, shard_hint=[1, 3])


def test_stats_and_broadcast(spark):
    e = ToruaEngine(spark)
    e.put_many([(f"k{i}", "v" * i) for i in range(50)])
    stats = {r["shard_id"]: r["keys"] for r in e.stats().collect()}
    assert sum(stats.values()) == 50
    bg = e.broadcast_stats().collect()
    assert all(r["sent_to"] == 2 for r in bg)
    assert sum(r["keys"] for r in bg) == 50


def test_binary_values_roundtrip(spark):
    """The reference's true value model: opaque []byte
    (store.go:51-103; BDD 1 MB scenario features/distributed-storage
    .feature:74-79). Non-UTF-8 bytes, the empty value, and a >1 MB
    value must all round-trip byte-for-byte through put/get/upsert/
    delete, and stats must count value BYTES."""
    e = ToruaEngine(spark, value_type="binary")
    raw = bytes(range(256))                      # every byte value, not UTF-8
    big = bytes(range(256)) * 4200               # 1,075,200 bytes > 1 MB
    e.put_many([
        ("bin", raw),
        ("empty", b""),
        ("big", big),
        ("utf8", "héllo-数字".encode("utf-8")),
    ])
    assert e.get("bin") == raw
    assert e.get("empty") == b""
    assert e.get("big") == big
    assert e.get("utf8") == "héllo-数字".encode("utf-8")
    assert e.get("missing") is None

    # LWW overwrite with different bytes
    e.put("bin", b"\x00\x01\x02")
    assert e.get("bin") == b"\x00\x01\x02"

    # stats counts bytes of the binary payloads
    stats = e.stats().collect()
    assert sum(r["keys"] for r in stats) == 4
    total = sum(r["bytes"] for r in stats)
    assert total == 3 + 0 + len(big) + len("héllo-数字".encode("utf-8"))

    e.delete("big")
    assert e.get("big") is None
    assert sorted(e.list_keys()) == ["bin", "empty", "utf8"]


def test_compact_for_serving_keeps_results_and_is_warm(spark):
    e = ToruaEngine(spark)
    e.put_many([(f"key-{i}", f"v{i}") for i in range(5000)])
    e.compact_for_serving()
    import time

    assert e.get("key-42") == "v42"          # warm the path
    t0 = time.perf_counter()
    assert e.get("key-4711") == "v4711"
    dt_ms = (time.perf_counter() - t0) * 1000
    # generous bound: measured p50 ~51ms warm; allow heavy-host noise
    assert dt_ms < 500, dt_ms
    assert e.get("nope") is None
