"""Relational declared queries vs DuckDB oracle at sf0.001."""

import pytest

from tests.oracle import compare
from torua_spark.queries import relational_q


@pytest.mark.parametrize("name", sorted(relational_q.QUERIES))
def test_relational_query_matches_oracle(spark, sf_dir, name):
    compare(relational_q.QUERIES[name](spark, sf_dir), relational_q.ORACLE[name], sf_dir)
