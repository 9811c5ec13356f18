"""Test-side replica of the driver's DuckDB-oracle comparison.

Runs a declared Spark query and its oracle SQL on the same parquet
tables, then compares: column names (sorted), row count, and the
order-insensitive multiset of stringified row values — a strict
superset of the driver's hash check, so passing here should mean
hash-matching there.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from torua_spark.sources.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    con = duck_connection(sf_dir)
    try:
        res = con.execute(oracle_sql)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _rows_to_multiset(spark_cols, spark_rows)
    d = _rows_to_multiset(duck_cols, duck_rows)
    if s != d:
        diff_s = [x for x in s if x not in set(d)][:5]
        diff_d = [x for x in d if x not in set(s)][:5]
        raise AssertionError(
            f"value mismatch; spark-only={diff_s} duck-only={diff_d}"
        )
