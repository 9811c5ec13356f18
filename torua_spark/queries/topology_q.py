"""Declared topology/routing/health queries + DuckDB oracles.

The FNV-1a routing oracle is computed *in SQL* on the DuckDB side
(functions.hashing.fnv1a32_sql), so shard placement is hash-verified
against an independent implementation, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from torua_spark.constants import NODES, NUM_SHARDS
from torua_spark.functions.hashing import shard_for_key, shard_for_key_sql
from torua_spark.operators import health as healthops
from torua_spark.operators import kv as kvops
from torua_spark.operators import topology as topo
from torua_spark.sources.catalog import KV_VIEW_SQL, kv_view, load_table
from torua_spark.sources.local import local_df

# Gap-fill fixture (A17/A23): n2 is unhealthy, shards 1 and 3 unassigned.
GAPFILL_NODES = [
    ("n1", "http://127.0.0.1:8081", "healthy"),
    ("n2", "http://127.0.0.1:8082", "unhealthy"),
    ("n3", "http://127.0.0.1:8083", "healthy"),
]
GAPFILL_INITIAL = [(0, "n1", 1), (2, "n3", 1)]

N_HEALTH_NODES_TOTAL = 9  # n0..n7 probed via user_id % 8; n8 never probed


def q_shard_for_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    kv = kv_view(spark, sf_dir)
    return kv.select("key", shard_for_key(F.col("key"), NUM_SHARDS).alias("shard_id"))


def q_shard_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kvops.stats(kv_view(spark, sf_dir), NUM_SHARDS)


def q_assignment_roundrobin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topo.assignments_roundrobin(spark, NUM_SHARDS, NODES)


def q_assignment_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    initial = local_df(spark, GAPFILL_INITIAL, "shard_id int, node_id string, is_primary int")
    return topo.auto_assign_gapfill(initial, spark, NUM_SHARDS, GAPFILL_NODES)


def q_routing_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    kv = kv_view(spark, sf_dir)
    assigns = topo.assignments_roundrobin(spark, NUM_SHARDS, NODES)
    return topo.routing_trace(kv, assigns, NUM_SHARDS)


# Routing-error fixture (A18 error paths): shard 0 unassigned, shard 1
# assigned to never-registered n9, shard 2 to unhealthy n2, shard 3 to
# healthy n1 — one row per coordinator error code (503/503/502/200).
ERROR_TRACE_ASSIGNS = [(1, "n9", 1), (2, "n2", 1), (3, "n1", 1)]
ERROR_TRACE_MEMBERS = [
    ("n1", "http://127.0.0.1:8081", "healthy"),
    ("n2", "http://127.0.0.1:8082", "unhealthy"),
]


def q_routing_error_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 facade-parity proof (VERDICT r7 #7): the coordinator's
    routing ERROR semantics — 503 unassigned shard, 503 unregistered
    node, 502 unhealthy forward target, 200 ok — as a labeled column
    per key (cmd/coordinator/main.go:525-528,563-586,650)."""
    kv = kv_view(spark, sf_dir)
    assigns = local_df(
        spark, ERROR_TRACE_ASSIGNS,
        "shard_id int, node_id string, is_primary int",
    )
    members = local_df(
        spark, ERROR_TRACE_MEMBERS, "node_id string, addr string, status string"
    )
    return topo.route_status(kv, assigns, members, NUM_SHARDS)


def q_node_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    kv = kv_view(spark, sf_dir)
    assigns = topo.assignments_roundrobin(spark, NUM_SHARDS, NODES)
    return topo.node_stats(kv, assigns, NUM_SHARDS)


def q_broadcast_gather(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topo.broadcast_gather(kv_view(spark, sf_dir), spark, NUM_SHARDS, NODES)


def q_health_consecutive_failures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return healthops.consecutive_failures(load_table(spark, sf_dir, "events"))


def q_health_status_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = local_df(
        spark, [(f"n{i}",) for i in range(N_HEALTH_NODES_TOTAL)], "node_id string"
    )
    return healthops.status_join(load_table(spark, sf_dir, "events"), nodes)


QUERIES = {
    "shard_for_key": q_shard_for_key,
    "shard_distribution": q_shard_distribution,
    "shard_assignment_roundrobin": q_assignment_roundrobin,
    "shard_assignment_gapfill": q_assignment_gapfill,
    "routing_trace": q_routing_trace,
    "routing_error_trace": q_routing_error_trace,
    "node_stats_agg": q_node_stats_agg,
    "broadcast_gather": q_broadcast_gather,
    "health_consecutive_failures": q_health_consecutive_failures,
    "health_status_join": q_health_status_join,
}

_SHARD_SQL = shard_for_key_sql("key", NUM_SHARDS)
_NODE_IDS = [n[0] for n in NODES]
_RR_CASE = f"CASE WHEN i % 2 = 0 THEN '{_NODE_IDS[0]}' ELSE '{_NODE_IDS[1]}' END"
_ASSIGNS_SQL = f"""
    SELECT CAST(i AS INTEGER) AS shard_id, {_RR_CASE} AS node_id, 1 AS is_primary
    FROM range({NUM_SHARDS}) t(i)
"""
_PER_SHARD_SQL = f"""
    SELECT {_SHARD_SQL} AS shard_id, count(*) AS keys,
           CAST(sum(octet_length(encode(value))) AS BIGINT) AS bytes
    FROM kv GROUP BY 1
"""
_PROBES_SQL = """
    SELECT 'n' || (user_id % 8) AS node_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           CASE WHEN value < 50 THEN 1 ELSE 0 END AS fail
    FROM events WHERE event_type = 'error'
"""
_HEALTH_WIN_SQL = """
    SELECT node_id, ts, event_id, fail,
           row_number() OVER (PARTITION BY node_id ORDER BY ts, event_id) AS rn,
           sum(fail) OVER (PARTITION BY node_id ORDER BY ts, event_id
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s3,
           sum(fail) OVER (PARTITION BY node_id ORDER BY ts, event_id
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS s4
    FROM probes
"""

ORACLE = {
    "shard_for_key": f"""
        WITH kv AS ({KV_VIEW_SQL})
        SELECT key, {_SHARD_SQL} AS shard_id FROM kv
    """,
    "shard_distribution": f"""
        WITH kv AS ({KV_VIEW_SQL})
        SELECT {_SHARD_SQL} AS shard_id, count(*) AS keys,
               CAST(sum(octet_length(encode(value))) AS BIGINT) AS bytes
        FROM kv GROUP BY 1
    """,
    "shard_assignment_roundrobin": _ASSIGNS_SQL,
    "shard_assignment_gapfill": f"""
        WITH initial(shard_id, node_id, is_primary) AS (
            VALUES {", ".join(f"({s}, '{n}', {p})" for s, n, p in GAPFILL_INITIAL)}
        ),
        healthy(node_id, ord) AS (
            VALUES {", ".join(f"('{n[0]}', {i})" for i, n in enumerate(x for x in GAPFILL_NODES if x[2] == 'healthy'))}
        ),
        gaps AS (
            SELECT CAST(i AS INTEGER) AS shard_id FROM range({NUM_SHARDS}) t(i)
            WHERE i NOT IN (SELECT shard_id FROM initial)
        ),
        gaps_rn AS (
            SELECT shard_id, row_number() OVER (ORDER BY shard_id) - 1 AS rn FROM gaps
        ),
        filled AS (
            SELECT g.shard_id, h.node_id, 1 AS is_primary
            FROM gaps_rn g JOIN healthy h ON h.ord = g.rn % 2
        )
        SELECT shard_id, node_id, is_primary FROM initial
        UNION ALL SELECT shard_id, node_id, is_primary FROM filled
    """,
    "routing_trace": f"""
        WITH kv AS ({KV_VIEW_SQL}),
        routed AS (SELECT key, {_SHARD_SQL} AS shard_id FROM kv),
        assigns AS ({_ASSIGNS_SQL})
        SELECT key, shard_id, node_id FROM routed JOIN assigns USING (shard_id)
    """,
    "routing_error_trace": f"""
        WITH kv AS ({KV_VIEW_SQL}),
        routed AS (SELECT key, {_SHARD_SQL} AS shard_id FROM kv),
        assigns(shard_id, node_id) AS (VALUES (1, 'n9'), (2, 'n2'), (3, 'n1')),
        members(node_id, status) AS (
            VALUES ('n1', 'healthy'), ('n2', 'unhealthy')
        )
        SELECT r.key, r.shard_id, a.node_id,
               CASE WHEN a.node_id IS NULL THEN 503
                    WHEN m.node_id IS NULL THEN 503
                    WHEN m.status <> 'healthy' THEN 502
                    ELSE 200 END AS http_status,
               CASE WHEN a.node_id IS NULL THEN 'no node assigned for key'
                    WHEN m.node_id IS NULL THEN 'node not found'
                    WHEN m.status <> 'healthy' THEN 'failed to forward request'
                    ELSE 'ok' END AS reason
        FROM routed r
        LEFT JOIN assigns a USING (shard_id)
        LEFT JOIN members m ON m.node_id = a.node_id
    """,
    "node_stats_agg": f"""
        WITH kv AS ({KV_VIEW_SQL}),
        per_shard AS ({_PER_SHARD_SQL}),
        assigns AS ({_ASSIGNS_SQL})
        SELECT node_id, count(*) AS n_shards, CAST(sum(keys) AS BIGINT) AS keys,
               CAST(sum(bytes) AS BIGINT) AS bytes
        FROM per_shard JOIN assigns USING (shard_id)
        GROUP BY node_id
    """,
    "broadcast_gather": f"""
        WITH kv AS ({KV_VIEW_SQL}),
        per_shard AS ({_PER_SHARD_SQL}),
        assigns AS ({_ASSIGNS_SQL}),
        nodes(node_id) AS (VALUES {", ".join(f"('{n}')" for n in _NODE_IDS)}),
        per_node AS (
            SELECT node_id, count(*) AS n_shards, CAST(sum(keys) AS BIGINT) AS keys,
                   CAST(sum(bytes) AS BIGINT) AS bytes
            FROM per_shard JOIN assigns USING (shard_id) GROUP BY node_id
        )
        SELECT n.node_id, coalesce(p.n_shards, 0) AS n_shards,
               coalesce(p.keys, 0) AS keys, coalesce(p.bytes, 0) AS bytes,
               {len(_NODE_IDS)} AS sent_to
        FROM nodes n LEFT JOIN per_node p USING (node_id)
    """,
    "health_consecutive_failures": f"""
        WITH probes AS ({_PROBES_SQL}), w AS ({_HEALTH_WIN_SQL})
        SELECT node_id,
               CAST(sum(CASE WHEN s3 = 3 AND s4 = 3 AND rn >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS unhealthy_transitions,
               CAST(sum(fail) AS BIGINT) AS total_failures,
               count(*) AS total_probes
        FROM w GROUP BY node_id
    """,
    "health_status_join": f"""
        WITH probes AS ({_PROBES_SQL}), w AS ({_HEALTH_WIN_SQL}),
        latest AS (
            SELECT node_id,
                   CASE WHEN s3 = 3 AND rn >= 3 THEN 'unhealthy' ELSE 'healthy' END AS live_status,
                   row_number() OVER (PARTITION BY node_id ORDER BY ts DESC, event_id DESC) AS rdesc
            FROM w
        ),
        nodes AS (SELECT 'n' || i AS node_id FROM range({N_HEALTH_NODES_TOTAL}) t(i))
        SELECT n.node_id, coalesce(l.live_status, 'unknown') AS status
        FROM nodes n LEFT JOIN (SELECT node_id, live_status FROM latest WHERE rdesc = 1) l
        USING (node_id)
    """,
}
