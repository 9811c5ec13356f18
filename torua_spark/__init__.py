"""torua_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of johnjansen/torua.

The reference is a coordinator-routed, FNV-1a hash-sharded distributed
key-value store (reference: internal/storage/store.go, internal/shard/
shard.go, internal/coordinator/shard_registry.go) with a documented but
unimplemented graph / vector / temporal layer. This package re-expresses
that capability surface — plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) — as idiomatic
Spark DataFrame/SQL operators designed for 100 TB scale:

- routing/sharding     -> pure-Catalyst hash expressions (functions.hashing)
- KV CRUD semantics    -> filters / window dedup / anti-joins (operators.kv)
- cluster topology     -> joins over metadata DataFrames (operators.topology)
- health monitoring    -> rolling windows + stateful streaming (operators.health)
- scatter-gather aggs  -> Spark partial+final aggregation (operators.relational)
- graph traversals     -> iterative DataFrame self-joins (operators.graph)
- vectors / dedup / text -> operators.similarity / dedup / text_analysis

No RDDs, no row-at-a-time Python UDFs in any hot path; Python surfaces
only in Arrow-batched pandas UDFs where Spark lacks a native operator.
"""

__version__ = "0.1.0"

from torua_spark.session import get_spark  # noqa: F401
