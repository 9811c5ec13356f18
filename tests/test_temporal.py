"""Temporal declared queries vs DuckDB oracle."""

import pytest

from tests.oracle import compare
from torua_spark.queries import temporal_q


@pytest.mark.parametrize("name", sorted(temporal_q.QUERIES))
def test_temporal_query_matches_oracle(spark, sf_dir, name):
    compare(temporal_q.QUERIES[name](spark, sf_dir), temporal_q.ORACLE[name], sf_dir)


def test_topk_rank_bounds(spark, sf_dir):
    out = temporal_q.q_sliding_topk(spark, sf_dir).collect()
    assert all(1 <= r["rank"] <= 3 for r in out)
    per_day = {}
    for r in out:
        per_day.setdefault(r["day"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_day.values())


def test_funnel_is_monotone_and_ordered(spark, sf_dir):
    rows = sorted(
        temporal_q.q_event_funnel(spark, sf_dir).collect(), key=lambda r: r["stage"]
    )
    assert [r["event_type"] for r in rows] == ["signup", "click", "purchase"]
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0]["conversion"] == 1.0
    assert all(0.0 <= r["conversion"] <= 1.0 for r in rows)
