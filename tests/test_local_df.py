"""local_df: JVM-side literal relations (LocalTableScan, no Python
workers) must round-trip every fixture value shape the engine uses —
the reference's hostile-key matrix (distributed_storage_test.go:
497-528: unicode, spaces, colons, email) plus binary values
(store.go:51-103 "accepts any byte sequence") and empty relations.
"""

import math

from torua_spark.sources.local import local_df


def test_round_trip_hostile_strings(spark):
    rows = [
        (0, "simple"),
        (1, "user@example.com"),
        (2, "key-with-spaces here"),
        (3, "数字"),
        (4, "quote'd and back\\slashed"),
        (5, None),
    ]
    got = local_df(spark, rows, "id int, key string").orderBy("id").collect()
    assert [(r.id, r.key) for r in got] == rows


def test_round_trip_numerics_and_bool(spark):
    rows = [(1, 2**40, 1.5, True), (2, -7, float("nan"), False), (3, None, None, None)]
    got = (
        local_df(spark, rows, "a int, b long, c double, d boolean")
        .orderBy("a")
        .collect()
    )
    assert (got[0].b, got[0].c, got[0].d) == (2**40, 1.5, True)
    assert math.isnan(got[1].c) and got[1].d is False
    assert (got[2].b, got[2].c, got[2].d) == (None, None, None)


def test_round_trip_binary(spark):
    rows = [(b"\x00\xffraw",), (b"",), (None,)]
    got = local_df(spark, rows, "v binary").collect()
    assert sorted(
        (bytes(r.v) if r.v is not None else None for r in got),
        key=lambda x: (x is None, x),
    ) == [b"", b"\x00\xffraw", None]


def test_empty_relation_keeps_schema(spark):
    df = local_df(spark, [], "key string, value binary")
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<key:string,value:binary>"


def test_plan_is_local_table_scan(spark):
    """The whole point: literal fixtures must not become Python-RDD
    scans (32-task jobs with Python worker launch per stage)."""
    df = local_df(spark, [(1, "a")], "id int, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan
