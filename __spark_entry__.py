"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``torua_spark`` package; this module is
thin wiring over its declared-query registry (SURVEY.md §2.D).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from torua_spark.queries import all_oracle_sql, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end GraphRAG retrieval (the reference's
    north-star use case) — cosine top-k seed documents, one-hop
    purchase-graph expansion from a broadcast seed set, decayed score
    fusion, ranked context window. Composes the vector, graph, and
    ranking surfaces in one oracle-checked plan at sf0.001."""
    return all_queries()["graphrag_retrieve"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracle_sql()
