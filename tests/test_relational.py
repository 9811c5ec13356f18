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


def test_profile_table_semantics(spark):
    from torua_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [
            (1, "a", 1.5, [1, 2]),
            (2, None, None, []),
            (2, "b", 4.5, None),
        ],
        "k bigint, s string, v double, arr array<bigint>",
    )
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(out) == {"k", "s", "v", "arr"}
    k = out["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (3, 0, 2)
    assert (k["min_num"], k["max_num"]) == (1.0, 2.0)
    assert abs(k["avg_num"] - 5 / 3) < 1e-3
    s = out["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None
    v = out["v"]
    assert (v["n_nulls"], v["min_num"], v["max_num"], v["avg_num"]) == (
        1, 1.5, 4.5, 3.0,
    )
    # unsupported type still reports counts with null bounds
    arr = out["arr"]
    assert (arr["n_rows"], arr["n_nulls"], arr["n_distinct"]) == (3, 1, 2)
    assert arr["min_str"] is None and arr["min_num"] is None

    # column subset + approx sketch path: same counts, nd within HLL error
    ap = {r["col_name"]: r for r in profile_table(df, ["k"], approx=True).collect()}
    assert set(ap) == {"k"}
    assert abs(ap["k"]["n_distinct"] - 2) <= 1


def test_profile_correlations_semantics(spark):
    import pytest

    from torua_spark.operators.profile import profile_correlations

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0), (4.0, 8.0, 5.0)],
        "x double, y double, c double",
    )
    out = {(r["col_a"], r["col_b"]): r["corr"] for r in
           profile_correlations(df).collect()}
    assert out[("x", "y")] == 1.0          # perfectly linear
    assert out[("x", "c")] is None         # zero variance -> NULL
    assert set(out) == {("x", "y"), ("x", "c"), ("y", "c")}
    with pytest.raises(ValueError, match=">= 2 numeric"):
        profile_correlations(df.select("x"))
