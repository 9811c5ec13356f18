"""Admin/registry + multi-join declared queries vs DuckDB oracle."""

import pytest

from tests.oracle import compare
from torua_spark.queries import admin_q, joins_q


@pytest.mark.parametrize("name", sorted(admin_q.QUERIES))
def test_admin_query_matches_oracle(spark, sf_dir, name):
    compare(admin_q.QUERIES[name](spark, sf_dir), admin_q.ORACLE[name], sf_dir)


@pytest.mark.parametrize("name", sorted(joins_q.QUERIES))
def test_joins_query_matches_oracle(spark, sf_dir, name):
    compare(joins_q.QUERIES[name](spark, sf_dir), joins_q.ORACLE[name], sf_dir)


def test_state_machine_rejects_invalid(spark, sf_dir):
    rows = {
        (r["from_state"], r["to_state"]): r["allowed"]
        for r in admin_q.q_shard_state_machine(spark, sf_dir).collect()
    }
    assert rows[("deleted", "active")] == 0
    assert rows[("migrating", "migrating")] == 0
    assert rows[("active", "migrating")] == 1


def test_assignment_remove_idempotent(spark, sf_dir):
    out = admin_q.q_assignment_remove(spark, sf_dir).collect()
    assert {r["shard_id"] for r in out} == {0, 1}  # 2,3 removed; 7 was absent
