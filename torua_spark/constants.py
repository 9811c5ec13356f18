"""Engine constants pinned to the reference's semantic contract."""

# Reference: cmd/coordinator/main.go:218-234 — "Start with 4 shards".
# At 100 TB this would be 4k-16k shards (docs recommend 32-4096,
# shard_registry.go:112-120); the declared-query contract pins 4 so the
# oracle can verify routing determinism.
NUM_SHARDS = 4

# FNV-1a 32-bit parameters (reference: internal/coordinator/
# shard_registry.go:372-379 and internal/shard/shard.go:402-414).
FNV_OFFSET_BASIS = 2166136261
FNV_PRIME = 16777619
FNV_MOD = 4294967296  # 2**32

# Topology fixture shared by Spark queries and the DuckDB oracle
# (FIXTURES.md §2.2): two nodes, round-robin assignment shard_id % 2.
NODES = [
    ("n1", "http://127.0.0.1:8081", "healthy"),
    ("n2", "http://127.0.0.1:8082", "healthy"),
]

# Health monitor contract (reference: internal/coordinator/
# health_monitor.go:66-80,204-254): 3 consecutive failures => unhealthy,
# any success resets.
HEALTH_FAILURE_THRESHOLD = 3
