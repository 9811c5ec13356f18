"""Relational declared queries vs DuckDB oracle at sf0.001."""

import pytest

from tests.oracle import compare
from torua_spark.queries import relational_q


@pytest.mark.parametrize("name", sorted(relational_q.ORACLE))
def test_relational_query_matches_oracle(spark, sf_dir, name):
    compare(relational_q.QUERIES[name](spark, sf_dir), relational_q.ORACLE[name], sf_dir)


def test_approx_stats_within_tolerance(spark, sf_dir):
    """The query now carries its own tolerance contract: every
    within-bounds boolean must be TRUE (that's what the driver's
    hash-match against the all-TRUE oracle asserts too), and group
    counts must agree with the exact query's."""
    exact = {
        r["event_type"]: r
        for r in relational_q.QUERIES["quantile_stats"](spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: r
        for r in relational_q.QUERIES["approx_stats"](spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for et, a in approx.items():
        assert a["n"] == exact[et]["n"]  # plain count is exact either way
        assert a["users_within_10pct"], et
        assert a["median_within_1pct_rank"], et
        assert a["p95_within_1pct_rank"], et
