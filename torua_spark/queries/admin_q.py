"""Declared admin/registry queries completing §2.A parity (A12-A15,
A24, A25) plus the hostile-key routing contract from the reference's
key-pattern tests (features/distributed-storage.feature:100-113,
test/integration/distributed_storage_test.go:497-528).

All fixtures are inline literal tables built identically in Spark and
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from torua_spark.constants import NUM_SHARDS
from torua_spark.functions.hashing import shard_for_key, shard_for_key_sql
from torua_spark.sources.local import local_df

# Reference key-pattern fixtures: slashes, spaces, unicode, colons,
# email-shaped, empty-adjacent. (distributed_storage_test.go:497-528)
HOSTILE_KEYS = [
    "simple",
    "user@example.com",
    "path/to/resource",
    "key-with-spaces here",
    "数字",
    "key:with:colons:1:2:3",
    "MiXeD-CaSe_123",
]

# A12 fixture: current assignments + an admin reassignment batch
# (AssignShard overwrites, shard_registry.go:173-193).
ASSIGN_INITIAL = [(0, "n1"), (1, "n2"), (2, "n1"), (3, "n2")]
ASSIGN_UPDATES = [(1, "n3"), (3, "n3")]

# A13 fixture: RemoveShard is idempotent (shard_registry.go:225-237).
REMOVE_IDS = [2, 3, 7]  # 7 does not exist — removing it is a no-op

# A24 fixture: shard state machine (internal/shard/shard.go:26-52).
# Valid transitions: active->migrating, migrating->active,
# active->deleted, migrating->deleted.
STATE_REQUESTS = [
    (0, "active", "migrating"),
    (1, "migrating", "active"),
    (2, "active", "deleted"),
    (3, "deleted", "active"),      # invalid: deleted is terminal
    (0, "migrating", "migrating"), # invalid: self-transition not listed
]
VALID_TRANSITIONS = [
    ("active", "migrating"),
    ("migrating", "active"),
    ("active", "deleted"),
    ("migrating", "deleted"),
]


def q_hostile_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = local_df(spark, [(k,) for k in HOSTILE_KEYS], "key string")
    return keys.select("key", shard_for_key(F.col("key"), NUM_SHARDS).alias("shard_id"))


def q_assignment_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — AssignShard overwrite: LWW upsert on shard_id."""
    base = local_df(spark, ASSIGN_INITIAL, "shard_id int, node_id string").withColumn(
        "_v", F.lit(0)
    )
    upd = local_df(spark, ASSIGN_UPDATES, "shard_id int, node_id string").withColumn(
        "_v", F.lit(1)
    )
    w = Window.partitionBy("shard_id").orderBy(F.col("_v").desc())
    return (
        base.unionByName(upd)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("shard_id", "node_id")
    )


def q_assignment_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 — RemoveShard: idempotent anti-join delete."""
    base = local_df(spark, ASSIGN_INITIAL, "shard_id int, node_id string")
    remove = local_df(spark, [(i,) for i in REMOVE_IDS], "shard_id int")
    return base.join(remove, "shard_id", "left_anti")


def q_node_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 — inverted lookup GetNodeShards: per-node sorted shard list
    (emitted as a csv string so the comparison is type-portable)."""
    base = local_df(spark, ASSIGN_INITIAL, "shard_id int, node_id string")
    return base.groupBy("node_id").agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.concat_ws(",", F.sort_array(F.collect_list(F.col("shard_id").cast("string")))).alias(
            "shards_csv"
        ),
    )


def q_shard_state_machine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A24 — SetState validation: requested transitions joined against
    the allowed-transition table; allowed flag per request."""
    req = local_df(
        spark, STATE_REQUESTS, "shard_id int, from_state string, to_state string"
    )
    valid = local_df(spark, VALID_TRANSITIONS, "from_state string, to_state string").withColumn(
        "_ok", F.lit(1)
    )
    return (
        req.join(F.broadcast(valid), ["from_state", "to_state"], "left")
        .select(
            "shard_id", "from_state", "to_state",
            F.coalesce(F.col("_ok"), F.lit(0)).alias("allowed"),
        )
    )


def q_shard_op_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A25 — per-shard op counters: an ops log derived from events
    (click/view -> get, purchase/signup -> put, error -> delete; key =
    user_id as string) pivoted into Gets/Puts/Deletes columns —
    groupBy().pivot().count() over the routing expression."""
    from torua_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    ops = ev.select(
        shard_for_key(F.col("user_id").cast("string"), NUM_SHARDS).alias("shard_id"),
        F.when(F.col("event_type").isin("click", "view"), F.lit("get"))
        .when(F.col("event_type").isin("purchase", "signup"), F.lit("put"))
        .otherwise(F.lit("delete"))
        .alias("op"),
    )
    return (
        ops.groupBy("shard_id")
        .pivot("op", ["get", "put", "delete"])
        .count()
        .select(
            "shard_id",
            F.coalesce(F.col("get"), F.lit(0)).alias("gets"),
            F.coalesce(F.col("put"), F.lit(0)).alias("puts"),
            F.coalesce(F.col("delete"), F.lit(0)).alias("deletes"),
        )
    )


def q_assignment_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog snapshot diff via FULL OUTER join: old vs new
    assignment tables classified into unchanged / moved / added /
    removed — the admin view behind A12/A13 (what did this
    reassignment batch actually change?)."""
    old = local_df(spark, ASSIGN_INITIAL, "shard_id int, node_id string")
    new = local_df(
        spark, [(0, "n1"), (1, "n3"), (3, "n3"), (9, "n4")], "shard_id int, node_id string"
    )
    j = old.withColumnRenamed("node_id", "old_node").join(
        new.withColumnRenamed("node_id", "new_node"), "shard_id", "full_outer"
    )
    change = (
        F.when(F.col("old_node").isNull(), F.lit("added"))
        .when(F.col("new_node").isNull(), F.lit("removed"))
        .when(F.col("old_node") == F.col("new_node"), F.lit("unchanged"))
        .otherwise(F.lit("moved"))
    )
    return j.select("shard_id", "old_node", "new_node", change.alias("change"))


def q_shard_op_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) of A25's wide counters back to long form —
    `DataFrame.unpivot`, the inverse of groupBy().pivot(). Zero
    counters survive as explicit rows (coalesced before the melt)."""
    return q_shard_op_counters(spark, sf_dir).unpivot(
        ids=["shard_id"],
        values=["gets", "puts", "deletes"],
        variableColumnName="op",
        valueColumnName="n",
    )


QUERIES = {
    "kv_hostile_keys": q_hostile_keys,
    "shard_assignment_update": q_assignment_update,
    "shard_assignment_remove": q_assignment_remove,
    "node_shards": q_node_shards,
    "shard_state_machine": q_shard_state_machine,
    "shard_op_counters": q_shard_op_counters,
    "shard_op_unpivot": q_shard_op_unpivot,
    "shard_assignment_diff": q_assignment_diff,
}

_KEYS_VALUES = ", ".join(f"('{k}')" for k in HOSTILE_KEYS)
_INIT_VALUES = ", ".join(f"({s}, '{n}')" for s, n in ASSIGN_INITIAL)
_UPD_VALUES = ", ".join(f"({s}, '{n}')" for s, n in ASSIGN_UPDATES)
_REMOVE_IN = ", ".join(str(i) for i in REMOVE_IDS)
_REQ_VALUES = ", ".join(f"({s}, '{a}', '{b}')" for s, a, b in STATE_REQUESTS)
_VALID_VALUES = ", ".join(f"('{a}', '{b}')" for a, b in VALID_TRANSITIONS)

ORACLE = {
    "kv_hostile_keys": f"""
        WITH keys(key) AS (VALUES {_KEYS_VALUES})
        SELECT key, {shard_for_key_sql('key', NUM_SHARDS)} AS shard_id FROM keys
    """,
    "shard_assignment_update": f"""
        WITH base(shard_id, node_id) AS (VALUES {_INIT_VALUES}),
        upd(shard_id, node_id) AS (VALUES {_UPD_VALUES}),
        unioned AS (
            SELECT shard_id, node_id, 0 AS _v FROM base
            UNION ALL SELECT shard_id, node_id, 1 AS _v FROM upd
        )
        SELECT CAST(shard_id AS INTEGER) AS shard_id, node_id FROM (
            SELECT shard_id, node_id,
                   row_number() OVER (PARTITION BY shard_id ORDER BY _v DESC) AS _rn
            FROM unioned
        ) WHERE _rn = 1
    """,
    "shard_assignment_remove": f"""
        WITH base(shard_id, node_id) AS (VALUES {_INIT_VALUES})
        SELECT CAST(shard_id AS INTEGER) AS shard_id, node_id FROM base
        WHERE shard_id NOT IN ({_REMOVE_IN})
    """,
    "node_shards": f"""
        WITH base(shard_id, node_id) AS (VALUES {_INIT_VALUES})
        SELECT node_id, count(*) AS n_shards,
               string_agg(shard_id::VARCHAR, ',' ORDER BY shard_id::VARCHAR) AS shards_csv
        FROM base GROUP BY node_id
    """,
    "shard_state_machine": f"""
        WITH req(shard_id, from_state, to_state) AS (VALUES {_REQ_VALUES}),
        valid(from_state, to_state) AS (VALUES {_VALID_VALUES})
        SELECT CAST(r.shard_id AS INTEGER) AS shard_id, r.from_state, r.to_state,
               CASE WHEN v.from_state IS NULL THEN 0 ELSE 1 END AS allowed
        FROM req r LEFT JOIN valid v
          ON r.from_state = v.from_state AND r.to_state = v.to_state
    """,
    "shard_op_counters": f"""
        WITH ops AS (
            SELECT {shard_for_key_sql("user_id::VARCHAR", NUM_SHARDS)} AS shard_id,
                   CASE WHEN event_type IN ('click', 'view') THEN 'get'
                        WHEN event_type IN ('purchase', 'signup') THEN 'put'
                        ELSE 'delete' END AS op
            FROM events
        )
        SELECT shard_id,
               CAST(sum(CASE WHEN op = 'get' THEN 1 ELSE 0 END) AS BIGINT) AS gets,
               CAST(sum(CASE WHEN op = 'put' THEN 1 ELSE 0 END) AS BIGINT) AS puts,
               CAST(sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS deletes
        FROM ops GROUP BY shard_id
    """,
}

ORACLE["shard_assignment_diff"] = f"""
    WITH old AS (SELECT * FROM (VALUES {_INIT_VALUES}) AS t(shard_id, node_id)),
    new AS (SELECT * FROM (VALUES (0, 'n1'), (1, 'n3'), (3, 'n3'), (9, 'n4')) AS t(shard_id, node_id))
    SELECT CAST(coalesce(old.shard_id, new.shard_id) AS INTEGER) AS shard_id,
           old.node_id AS old_node, new.node_id AS new_node,
           CASE WHEN old.node_id IS NULL THEN 'added'
                WHEN new.node_id IS NULL THEN 'removed'
                WHEN old.node_id = new.node_id THEN 'unchanged'
                ELSE 'moved' END AS change
    FROM old FULL OUTER JOIN new ON old.shard_id = new.shard_id
"""

ORACLE["shard_op_unpivot"] = f"""
    WITH p AS ({ORACLE["shard_op_counters"]})
    SELECT shard_id, 'gets' AS op, gets AS n FROM p
    UNION ALL SELECT shard_id, 'puts' AS op, puts AS n FROM p
    UNION ALL SELECT shard_id, 'deletes' AS op, deletes AS n FROM p
"""
