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


def test_asof_property_random_frames_vs_duckdb(spark):
    """Property check: asof_join (both directions, with and without
    tolerance) agrees with DuckDB's native ASOF JOIN on randomized
    frames — duplicate keys, tied timestamps, NULL payloads, keys
    present on only one side. Deterministic seed; pure driver-side
    data so the whole matrix runs in seconds."""
    import random

    import duckdb

    from torua_spark.operators.asof import asof_join

    rng = random.Random(20260813)
    base = 1_700_000_000
    for trial in range(3):
        lrows = [
            (rng.randint(0, 5), base + rng.randint(0, 1000), i)
            for i in range(rng.randint(5, 40))
        ]
        rrows = [
            (
                rng.randint(0, 6),
                base + rng.randint(0, 1000),
                None if rng.random() < 0.2 else rng.randint(0, 99),
            )
            for _ in range(rng.randint(5, 40))
        ]
        # Dedup (key, ts) on the right: at tied (key, ts) our operator
        # documents a greatest-payload tie-break while DuckDB ASOF
        # picks an arbitrary row — exclude the documented divergence.
        seen = {}
        for k, ts, p in rrows:
            seen[(k, ts)] = p
        rrows = [(k, ts, p) for (k, ts), p in seen.items()]

        ldf = spark.createDataFrame(
            [(k, __import__("datetime").datetime.utcfromtimestamp(ts), i)
             for k, ts, i in lrows],
            "k long, ts timestamp, row_id long",
        )
        rdf = spark.createDataFrame(
            [(k, __import__("datetime").datetime.utcfromtimestamp(ts), p)
             for k, ts, p in rrows],
            "k long, ts timestamp, payload long",
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE l(k BIGINT, ts TIMESTAMP, row_id BIGINT)")
        con.execute("CREATE TABLE r(k BIGINT, ts TIMESTAMP, payload BIGINT)")
        con.executemany("INSERT INTO l VALUES (?, to_timestamp(?), ?)",
                        [(k, ts, i) for k, ts, i in lrows])
        con.executemany("INSERT INTO r VALUES (?, to_timestamp(?), ?)",
                        [(k, ts, p) for k, ts, p in rrows])

        for direction, op in (("backward", ">="), ("forward", "<=")):
            for tol in (None, 100):
                got = {
                    r["row_id"]: r["payload"]
                    for r in asof_join(
                        ldf, rdf, on="k", left_ts="ts", right_ts="ts",
                        payload="payload", direction=direction,
                        tolerance_seconds=tol,
                    ).collect()
                }
                tol_pred = (
                    "TRUE" if tol is None
                    else f"abs(epoch(l.ts) - epoch(r.ts)) <= {tol}"
                )
                want = {
                    row[0]: (row[1] if row[2] else None)
                    for row in con.execute(f"""
                        SELECT l.row_id, r.payload,
                               r.k IS NOT NULL AND {tol_pred} AS ok
                        FROM l ASOF LEFT JOIN r
                          ON l.k = r.k AND l.ts {op} r.ts
                    """).fetchall()
                }
                assert got == want, (trial, direction, tol)
