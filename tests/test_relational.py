"""Relational declared queries vs DuckDB oracle at sf0.001."""

import pytest

from tests.oracle import compare
from torua_spark.queries import relational_q


@pytest.mark.parametrize("name", sorted(relational_q.ORACLE))
def test_relational_query_matches_oracle(spark, sf_dir, name):
    compare(relational_q.QUERIES[name](spark, sf_dir), relational_q.ORACLE[name], sf_dir)


def test_approx_stats_within_tolerance(spark, sf_dir):
    """Sketch estimates vs exact answers: HLL++ at rsd=2% should land
    within 10% (generous at small cardinalities), approximate
    percentiles within the observed value range and near the exact
    quantile."""
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
        e = exact[et]
        assert a["n"] == e["n"]  # plain count is exact either way
        assert abs(a["approx_users"] - e["n_users"]) <= max(2, 0.1 * e["n_users"])
        spread = max(abs(e["p95_value"]), 1.0)
        assert abs(a["approx_median"] - e["median_value"]) <= 0.05 * spread
        assert abs(a["approx_p95"] - e["p95_value"]) <= 0.05 * spread
