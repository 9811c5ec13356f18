"""Declared-query registry (SURVEY.md §2.D).

Each submodule defines ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLE`` (name -> DuckDB SQL string). The driver runs
both sides at sf=0.01 and hash-compares; names missing from ``ORACLE``
get a weaker rows-only check. ``__spark_entry__.py`` re-exports the
merged registries.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = [
    "torua_spark.queries.kv_q",
    "torua_spark.queries.topology_q",
    "torua_spark.queries.admin_q",
    "torua_spark.queries.temporal_q",
    "torua_spark.queries.relational_q",
    "torua_spark.queries.joins_q",
    "torua_spark.queries.asof_q",
    "torua_spark.queries.udf_q",
    "torua_spark.queries.graph_q",
    "torua_spark.queries.rag_q",
    "torua_spark.queries.pipeline_q",
    "torua_spark.queries.streaming_q",
]


def all_queries() -> dict:
    out = {}
    for m in _MODULES:
        try:
            out.update(import_module(m).QUERIES)
        except ModuleNotFoundError:
            pass
    return out


def all_oracle_sql() -> dict:
    out = {}
    for m in _MODULES:
        try:
            out.update(import_module(m).ORACLE)
        except ModuleNotFoundError:
            pass
    return out
