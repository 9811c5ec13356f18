"""BDD parity, part 2: the reference's features/cluster-management.feature
scenarios replayed against the topology/health operator surface. Each
test cites its feature lines.

Scope note (SURVEY §7 non-goals): scenarios about live process
orchestration — coordinator failover (feature:46), split-brain
(feature:53), config broadcast (feature:101), Prometheus metrics
format (feature:125), rolling upgrade (feature:137), load-based
rebalancing (feature:146, needs a load signal the data model doesn't
carry), and multi-coordinator consensus (feature:155) — are
deployment-infrastructure behavior, not query/data semantics; the
DATA effects they imply (reassignment, exclusion of unhealthy nodes,
even distribution) are asserted by the tests below.
"""

from pyspark.sql import functions as F

from torua_spark.constants import NUM_SHARDS
from torua_spark.operators import topology as tp

TWO_NODES = [("n1", "localhost:8081", "healthy"), ("n2", "localhost:8082", "healthy")]
THREE_NODES = TWO_NODES + [("n3", "localhost:8083", "healthy")]


def _counts(assignments):
    return {
        r["node_id"]: r["n"]
        for r in assignments.groupBy("node_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def _kv(spark, n=20):
    return spark.createDataFrame(
        [(f"key{i}", f"value{i}") for i in range(n)], "key string, value string"
    )


def test_initial_cluster_formation_even_distribution(spark):
    """feature:10-15 'Initial cluster formation': 2 registered healthy
    nodes, shards evenly distributed."""
    nodes = tp.nodes_df(spark, TWO_NODES)
    assert nodes.count() == 2
    assert nodes.filter(F.col("status") == "healthy").count() == 2
    a = tp.assignments_roundrobin(spark, NUM_SHARDS, TWO_NODES)
    counts = _counts(a)
    assert set(counts) == {"n1", "n2"}
    assert max(counts.values()) - min(counts.values()) <= 1  # even


def test_unhealthy_node_excluded_and_shards_redistributed(spark):
    """feature:17-21 'Node health monitoring': once n1 is unhealthy its
    shards are redistributed — the gap-fill never picks n1."""
    sick = [("n1", "localhost:8081", "unhealthy")] + TWO_NODES[1:]
    a = tp.assignments_roundrobin(spark, NUM_SHARDS, TWO_NODES)
    survivors = a.filter(F.col("node_id") != "n1")
    re = tp.auto_assign_gapfill(survivors, spark, NUM_SHARDS, sick)
    assert re.count() == NUM_SHARDS  # every shard assigned again
    assert re.filter(F.col("node_id") == "n1").count() == 0
    assert re.select("shard_id").distinct().count() == NUM_SHARDS


def test_graceful_shutdown_reassigns_without_data_loss(spark):
    """feature:23-29 'Node graceful shutdown': n1's shards move to the
    other nodes and every key stays routable (no data loss)."""
    kv = _kv(spark)
    a = tp.assignments_roundrobin(spark, NUM_SHARDS, THREE_NODES)
    survivors = a.filter(F.col("node_id") != "n1")
    re = tp.auto_assign_gapfill(
        survivors, spark, NUM_SHARDS,
        [("n1", "localhost:8081", "draining")] + THREE_NODES[1:],
    )
    trace = tp.routing_trace(kv, re)
    assert trace.count() == kv.count()            # every key has a home
    assert trace.filter(F.col("node_id") == "n1").count() == 0
    assert trace.filter(F.col("node_id").isNull()).count() == 0


def test_new_node_registration_and_rebalance(spark):
    """feature:31-44 'New node auto-registration' + 'Shard rebalancing
    after node addition': n3 appears in the node list and a rebalance
    spreads shards evenly across all three, keys stay accessible."""
    nodes = tp.nodes_df(spark, THREE_NODES)
    assert {r["node_id"] for r in nodes.collect()} == {"n1", "n2", "n3"}
    a = tp.assignments_roundrobin(spark, NUM_SHARDS, THREE_NODES)
    counts = _counts(a)
    assert set(counts) == {"n1", "n2", "n3"}
    assert max(counts.values()) - min(counts.values()) <= 1
    kv = _kv(spark)
    assert tp.routing_trace(kv, a).count() == kv.count()


def test_cluster_information_fields(spark):
    """feature:68-79 'Cluster information API': the coordinator-level
    rollup is one aggregate over the node+assignment dims."""
    nodes = tp.nodes_df(spark, [("n1", "localhost:8081", "healthy"),
                                ("n2", "localhost:8082", "unhealthy")])
    a = tp.assignments_roundrobin(spark, NUM_SHARDS, TWO_NODES)
    info = (
        nodes.agg(
            F.count(F.lit(1)).alias("total_nodes"),
            F.sum((F.col("status") == "healthy").cast("long")).alias("healthy_nodes"),
        )
        .crossJoin(
            a.agg(
                F.lit(NUM_SHARDS).alias("total_shards"),
                F.count(F.lit(1)).alias("assigned_shards"),
            )
        )
        .withColumn(
            "cluster_state",
            F.when(
                (F.col("healthy_nodes") == F.col("total_nodes"))
                & (F.col("assigned_shards") == F.col("total_shards")),
                F.lit("healthy"),
            ).otherwise(F.lit("degraded")),
        )
        .collect()[0]
    )
    assert info["total_nodes"] == 2 and info["healthy_nodes"] == 1
    assert info["total_shards"] == NUM_SHARDS
    assert info["assigned_shards"] == NUM_SHARDS
    assert info["cluster_state"] == "degraded"


def test_node_information_fields(spark):
    """feature:81-91 'Node information API': per-node id, address,
    status, shard_count (+ data stats the reference exposes per shard)."""
    kv = _kv(spark)
    a = tp.assignments_roundrobin(spark, NUM_SHARDS, TWO_NODES)
    stats = tp.node_stats(kv, a)
    nodes = tp.nodes_df(spark, TWO_NODES)
    info = {r["node_id"]: r for r in stats.join(nodes, "node_id").collect()}
    assert set(info) == {"n1", "n2"}
    for r in info.values():
        assert r["addr"].startswith("localhost:")
        assert r["status"] == "healthy"
        assert r["n_shards"] >= 1
        assert r["keys"] >= 0 and r["bytes"] >= 0


def test_bulk_maintenance_drains_two_nodes(spark):
    """feature:93-99 'Bulk node operations': n1+n2 enter maintenance,
    their shards all land on n3, existing data stays served (every key
    routable through the new assignment)."""
    maint = [("n1", "localhost:8081", "maintenance"),
             ("n2", "localhost:8082", "maintenance"),
             ("n3", "localhost:8083", "healthy")]
    a = tp.assignments_roundrobin(spark, NUM_SHARDS, THREE_NODES)
    survivors = a.filter(~F.col("node_id").isin("n1", "n2"))
    re = tp.auto_assign_gapfill(survivors, spark, NUM_SHARDS, maint)
    assert re.count() == NUM_SHARDS
    assert set(_counts(re)) == {"n3"}
    kv = _kv(spark)
    assert tp.routing_trace(kv, re).count() == kv.count()


def test_failure_recovery_no_automatic_reassignment(spark):
    """feature:108-115 'Automatic failure recovery': a returning node
    is available again but gap-fill does NOT move assigned shards back
    — only an explicit rebalance does."""
    # n2 failed, its shards were reassigned to n1
    a = tp.assignments_roundrobin(spark, NUM_SHARDS, TWO_NODES)
    reassigned = tp.auto_assign_gapfill(
        a.filter(F.col("node_id") != "n2"), spark, NUM_SHARDS,
        [("n1", "localhost:8081", "healthy"), ("n2", "localhost:8082", "unhealthy")],
    )
    assert set(_counts(reassigned)) == {"n1"}
    # n2 re-registers healthy: no gaps exist, so gap-fill changes NOTHING
    back = tp.auto_assign_gapfill(reassigned, spark, NUM_SHARDS, TWO_NODES)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, reassigned.collect()))
    # manual rebalance is what restores even spread
    rebal = tp.assignments_roundrobin(spark, NUM_SHARDS, TWO_NODES)
    counts = _counts(rebal)
    assert max(counts.values()) - min(counts.values()) <= 1


def test_routing_error_codes_match_coordinator_contract(spark):
    """Error-path parity (cmd/coordinator/main.go:525-528,563-586,650):
    unassigned shard -> 503 'no node assigned for key'; shard assigned
    to an unregistered node -> 503 'node not found'; node registered
    but unhealthy -> 502 'failed to forward request'; healthy -> 200.
    Fixture covers all four codes over deterministic shard routing."""
    kv = _kv(spark, 40)
    assigns = spark.createDataFrame(
        [(1, "n9", 1), (2, "n2", 1), (3, "n1", 1)],
        "shard_id int, node_id string, is_primary int",
    )
    members = spark.createDataFrame(
        [("n1", "a1", "healthy"), ("n2", "a2", "unhealthy")],
        "node_id string, addr string, status string",
    )
    out = tp.route_status(kv, assigns, members, NUM_SHARDS).collect()
    assert len(out) == 40  # left joins never drop or multiply keys
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard_id, set()).add(
            (r.node_id, r.http_status, r.reason)
        )
    assert by_shard[0] == {(None, 503, "no node assigned for key")}
    assert by_shard[1] == {("n9", 503, "node not found")}
    assert by_shard[2] == {("n2", 502, "failed to forward request")}
    assert by_shard[3] == {("n1", 200, "ok")}


def test_control_endpoint_is_logged_noop(spark):
    """node /control parity (cmd/node/main.go:236,334-341): 'Logs
    payload for debugging; always returns success; no actual control
    operations yet' — the facade method mutates nothing and chains."""
    from torua_spark.engine import ToruaEngine

    eng = ToruaEngine(spark).put("k1", "v1")
    before = sorted(map(tuple, eng.dataframe().collect()))
    assert eng.control({"op": "rebalance"}) is eng
    assert eng.control("noise") is eng
    assert sorted(map(tuple, eng.dataframe().collect())) == before
    # engine-level route_status rides the same operator
    rs = {r.key: r.http_status for r in eng.route_status(["k1", "k2"]).collect()}
    assert set(rs.values()) == {200}  # default topology: all healthy
