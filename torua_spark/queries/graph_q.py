"""Declared graph queries (B1/B2/B6) + oracles.

`graph_2hop`, `graph_degree`, `graph_triangle_agg` are SQL-expressible
and hash-checked. `connected_components` and `graph_pagerank` are
iterative (not single-statement ANSI SQL) — rows-only for the driver,
with pytest verifying them against pure-Python references at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from torua_spark.operators import graph as g
from torua_spark.sources.catalog import load_table

EDGES_SQL = """
    SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


def q_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return g.two_hop(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
    )


def q_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    return g.out_degree(
        g.copurchase_edges(
            load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
        )
    )


def q_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return g.triangle_pattern(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return g.connected_components(
        g.copurchase_vertex_edges(
            load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
        )
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return g.pagerank(
        g.copurchase_vertex_edges(
            load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
        ),
        iterations=10,
    )


QUERIES = {
    "graph_2hop": q_two_hop,
    "graph_degree": q_degree,
    "graph_triangle_agg": q_triangle,
    "connected_components": q_connected_components,
    "graph_pagerank": q_pagerank,
}

ORACLE = {
    "graph_2hop": f"""
        WITH e AS ({EDGES_SQL})
        SELECT src AS c_custkey, dst AS s_suppkey FROM e
        WHERE src IN (SELECT c_custkey FROM customer)
          AND dst IN (SELECT s_suppkey FROM supplier)
    """,
    "graph_degree": f"""
        WITH e AS ({EDGES_SQL})
        SELECT src AS custkey, count(*) AS degree FROM e GROUP BY src
    """,
    "graph_triangle_agg": """
        SELECT r.r_name AS region, n.n_name AS nation,
               count(*) AS n_customers,
               floor((sum(c.c_acctbal)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    """,
    # connected_components / graph_pagerank: iterative — rows-only.
}
