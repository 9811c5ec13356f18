"""As-of / range join queries vs DuckDB's native operators."""

import pytest

from tests.oracle import compare
from torua_spark.queries import asof_q


@pytest.mark.parametrize("name", sorted(asof_q.QUERIES))
def test_asof_query_matches_oracle(spark, sf_dir, name):
    compare(asof_q.QUERIES[name](spark, sf_dir), asof_q.ORACLE[name], sf_dir)


def test_asof_inclusive_and_null_semantics(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-05"), (1, "2024-01-10"), (2, "2024-01-01")],
        "k long, ts string",
    ).selectExpr("k", "cast(ts as timestamp) as ts")
    right = spark.createDataFrame(
        [(1, "2024-01-05", "a"), (1, "2024-01-08", "b"), (2, "2024-06-01", "z")],
        "k long, ts string, v string",
    ).selectExpr("k", "cast(ts as timestamp) as ts", "v")
    from torua_spark.operators.asof import asof_join

    out = {(r["k"], str(r["ts"])[:10]): r["v"]
           for r in asof_join(left, right, "k", "ts", "ts", "v").collect()}
    assert out[(1, "2024-01-05")] == "a"   # inclusive: equal ts matches
    assert out[(1, "2024-01-10")] == "b"   # latest prior
    assert out[(2, "2024-01-01")] is None  # no prior right row


def test_asof_null_payload_wins_and_ties_deterministic(spark):
    """ADVICE r1: a right row whose payload is genuinely NULL must be
    MATCHED (its NULL returned — native ASOF semantics), not skipped
    in favor of an older non-null payload; and multiple right rows at
    the same (key, ts) must resolve deterministically (greatest
    payload wins)."""
    left = spark.createDataFrame(
        [(1, "2024-01-09"), (2, "2024-01-09")], "k long, ts string"
    ).selectExpr("k", "cast(ts as timestamp) as ts")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01", "old"),
            (1, "2024-01-08", None),        # newer but NULL payload
            (2, "2024-01-05", "x"),
            (2, "2024-01-05", "z"),         # tie at same (k, ts)
        ],
        "k long, ts string, v string",
    ).selectExpr("k", "cast(ts as timestamp) as ts", "v")
    from torua_spark.operators.asof import asof_join

    out = {r["k"]: r["v"] for r in asof_join(left, right, "k", "ts", "ts", "v").collect()}
    assert out[1] is None    # the NULL-payload row is the match
    assert out[2] == "z"     # deterministic: greatest payload wins
