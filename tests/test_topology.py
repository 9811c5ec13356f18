"""Topology/health declared queries vs DuckDB oracle + semantics."""

import pytest

from tests.oracle import compare
from torua_spark.queries import topology_q


@pytest.mark.parametrize("name", sorted(topology_q.QUERIES))
def test_topology_query_matches_oracle(spark, sf_dir, name):
    compare(topology_q.QUERIES[name](spark, sf_dir), topology_q.ORACLE[name], sf_dir)


def test_gapfill_assigns_only_healthy_nodes(spark, sf_dir):
    out = topology_q.q_assignment_gapfill(spark, sf_dir)
    rows = {r["shard_id"]: r["node_id"] for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert "n2" not in rows.values()  # unhealthy node receives nothing


def test_routing_trace_is_deterministic(spark, sf_dir):
    a = {r["key"]: r["node_id"] for r in topology_q.q_routing_trace(spark, sf_dir).collect()}
    b = {r["key"]: r["node_id"] for r in topology_q.q_routing_trace(spark, sf_dir).collect()}
    assert a == b


def test_health_status_values(spark, sf_dir):
    rows = {r["node_id"]: r["status"] for r in topology_q.q_health_status_join(spark, sf_dir).collect()}
    assert rows["n8"] == "unknown"  # never probed
    assert all(s in ("healthy", "unhealthy", "unknown") for s in rows.values())
