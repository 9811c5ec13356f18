"""Cluster-topology operators (reference §2.A A9-A20, A22-A25).

The reference's coordinator keeps an in-memory shard registry
(internal/coordinator/shard_registry.go) and node list
(internal/cluster/types.go:34-57) and routes every request through
them. The engine models both as small metadata DataFrames and
re-expresses the registry operations as joins/projections:

- key→shard→node routing (A9/A10/A18) = routing projection +
  broadcast hash join against the assignment table
- round-robin rebalance (A16) and gap-fill auto-assign (A17) =
  deterministic assignment transforms
- node stats rollup (A8/A7) = two-level partial+final aggregation
- broadcast fan-out/gather (A19, cmd/coordinator/main.go:446-495) =
  scatter-gather: per-node aggregation + a sent_to count, with
  per-node partial-failure tolerance modeled as a left join

Scale: assignment/nodes tables are tiny dims — Catalyst broadcasts
them; the only shuffle is the per-shard aggregation over the fact,
which is partial+final (map-side combine) on the routing expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from torua_spark.constants import NODES, NUM_SHARDS
from torua_spark.functions.hashing import shard_for_key
from torua_spark.operators.kv import stats as shard_stats
from torua_spark.sources.local import local_df


def nodes_df(spark: SparkSession, nodes: list[tuple[str, str, str]] | None = None) -> DataFrame:
    return local_df(spark, nodes or NODES, "node_id string, addr string, status string")


def assignments_roundrobin(
    spark: SparkSession,
    num_shards: int = NUM_SHARDS,
    nodes: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """A16 — RebalanceShards: ``shard i -> nodes[i % len(nodes)]``, all
    primary (shard_registry.go:554-577)."""
    node_ids = [n[0] for n in (nodes or NODES)]
    arr = F.array(*[F.lit(n) for n in node_ids])
    return spark.range(num_shards).select(
        F.col("id").cast("int").alias("shard_id"),
        F.element_at(arr, (F.pmod(F.col("id"), F.lit(len(node_ids))) + 1).cast("int")).alias("node_id"),
        F.lit(1).alias("is_primary"),
    )


def auto_assign_gapfill(assignments: DataFrame, spark: SparkSession,
                        num_shards: int = NUM_SHARDS,
                        nodes: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """A17 — assign only *unassigned* shards, round-robin over healthy
    nodes (cmd/coordinator/main.go:976-1013). left_anti finds the gaps;
    row_number % n_healthy distributes them."""
    from pyspark.sql import Window

    healthy = [n[0] for n in (nodes or NODES) if n[2] == "healthy"]
    arr = F.array(*[F.lit(n) for n in healthy])
    all_shards = spark.range(num_shards).select(F.col("id").cast("int").alias("shard_id"))
    gaps = all_shards.join(assignments.select("shard_id"), "shard_id", "left_anti")
    w = Window.orderBy("shard_id")
    filled = gaps.withColumn(
        "node_id",
        F.element_at(arr, (F.pmod(F.row_number().over(w) - 1, F.lit(len(healthy))) + 1).cast("int")),
    ).withColumn("is_primary", F.lit(1))
    return assignments.unionByName(filled)


def routing_trace(kv: DataFrame, assignments: DataFrame, num_shards: int = NUM_SHARDS) -> DataFrame:
    """A10/A18 — key -> shard -> node trace. The assignment join is a
    broadcast hash join (dim is O(num_shards) rows)."""
    routed = kv.select("key", shard_for_key(F.col("key"), num_shards).alias("shard_id"))
    return routed.join(F.broadcast(assignments.select("shard_id", "node_id")), "shard_id").select(
        "key", "shard_id", "node_id"
    )


def route_status(kv: DataFrame, assignments: DataFrame, nodes: DataFrame,
                 num_shards: int = NUM_SHARDS) -> DataFrame:
    """A18 error-path parity — the HTTP status the coordinator would
    return for each key's routing attempt (cmd/coordinator/main.go:
    525-528 doc block; 563-586 the two 503 paths; 650 the 502 path):

    - shard has no assignment row        -> 503 'no node assigned for key'
    - assigned node not in membership    -> 503 'node not found'
    - node registered but not healthy    -> 502 'failed to forward request'
    - otherwise                          -> 200 'ok'

    Both dims broadcast (O(num_shards) and O(nodes) rows); the fact
    side never shuffles — same plan shape as ``routing_trace``."""
    routed = kv.select(
        "key", shard_for_key(F.col("key"), num_shards).alias("shard_id")
    )
    a = F.broadcast(assignments.select("shard_id", "node_id"))
    m = F.broadcast(
        nodes.select(F.col("node_id").alias("_member"), "status")
    )
    out = (
        routed.join(a, "shard_id", "left")
        .join(m, F.col("node_id") == F.col("_member"), "left")
    )
    unassigned = F.col("node_id").isNull()
    unregistered = F.col("_member").isNull()
    unhealthy = F.col("status") != "healthy"
    return out.select(
        "key", "shard_id", "node_id",
        F.when(unassigned, F.lit(503))
        .when(unregistered, F.lit(503))
        .when(unhealthy, F.lit(502))
        .otherwise(F.lit(200)).alias("http_status"),
        F.when(unassigned, F.lit("no node assigned for key"))
        .when(unregistered, F.lit("node not found"))
        .when(unhealthy, F.lit("failed to forward request"))
        .otherwise(F.lit("ok")).alias("reason"),
    )


def node_stats(kv: DataFrame, assignments: DataFrame, num_shards: int = NUM_SHARDS) -> DataFrame:
    """A7+A8 — per-shard Stats rolled up to node level
    (cmd/node/main.go:750-773): partial+final agg then broadcast join."""
    per_shard = shard_stats(kv, num_shards)
    return (
        per_shard.join(F.broadcast(assignments.select("shard_id", "node_id")), "shard_id")
        .groupBy("node_id")
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("keys").alias("keys"),
            F.sum("bytes").alias("bytes"),
        )
    )


def broadcast_gather(kv: DataFrame, spark: SparkSession,
                     num_shards: int = NUM_SHARDS,
                     nodes: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """A19 — broadcast fan-out + gather (cmd/coordinator/main.go:446-495).

    Every registered node is contacted (sent_to = node count) and each
    reports its local aggregate; a node with no assigned data still
    responds (left join, zero-filled) — the per-node-failure-tolerant
    gather shape.
    """
    all_nodes = nodes_df(spark, nodes)
    assigns = assignments_roundrobin(spark, num_shards, nodes)
    per_node = node_stats(kv, assigns, num_shards)
    sent_to = len(nodes or NODES)  # membership list size — no job needed
    return (
        all_nodes.select("node_id")
        .join(per_node, "node_id", "left")
        .select(
            "node_id",
            F.coalesce(F.col("n_shards"), F.lit(0)).alias("n_shards"),
            F.coalesce(F.col("keys"), F.lit(0)).alias("keys"),
            F.coalesce(F.col("bytes"), F.lit(0)).alias("bytes"),
            F.lit(sent_to).alias("sent_to"),
        )
    )
