"""Declared multi-join / top-k / skew-technique queries.

These widen the relational surface beyond Q1: a 3-way fact join with
group-top-k (Q3 shape), a 5-way star join through broadcast dims (Q5
shape — the scatter-gather "broadcast query" B5 at its most general),
and a salted two-stage aggregation that returns *identical* results to
the plain aggregation while demonstrating the skew-mitigation shape
used on hot keys at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from torua_spark.functions.compat import round4
from torua_spark.functions.ranking import global_topk
from torua_spark.sources.catalog import load_table

N_SALTS = 16


def q_join_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: BUILDING-segment customers' open orders ranked
    by revenue, top 10 (rank window, deterministic orderkey tiebreak)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    joined = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(l.select("l_orderkey", "l_extendedprice", "l_discount"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(round4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )
    return global_topk(
        joined, [F.col("revenue").desc(), F.col("o_orderkey")], 10
    ).select("o_orderkey", "revenue", "rank")


def q_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per region/nation through the full star
    (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region); nation/region
    broadcast, customer joined on key. Catalyst orders the join tree;
    the two fact joins are the only shuffles."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            round4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation shape: two-stage salted aggregation over events
    (stage 1 groups on (event_type, salt), stage 2 merges) — identical
    result to a direct groupBy, which is exactly what the oracle
    computes. On a skewed key distribution the salt spreads the hot
    key over N_SALTS reducers."""
    ev = load_table(spark, sf_dir, "events")
    stage1 = (
        ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(N_SALTS)))
        .groupBy("event_type", "_salt")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    return stage1.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        round4(F.sum("v")).alias("sum_value"),
    )


QUERIES = {
    "join_topk_revenue": q_join_topk_revenue,
    "star_join_revenue": q_star_join_revenue,
    "skew_salted_agg": q_salted_agg,
}

ORACLE = {
    "join_topk_revenue": """
        WITH joined AS (
            SELECT o.o_orderkey,
                   floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 10000.0 + 0.5 + 1e-9)
                       / 10000.0 AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY o.o_orderkey
        )
        SELECT o_orderkey, revenue, CAST(rank AS INTEGER) AS rank FROM (
            SELECT *, row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS rank
            FROM joined
        ) WHERE rank <= 10
    """,
    "star_join_revenue": """
        SELECT r.r_name AS region, n.n_name AS nation,
               floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 10000.0 + 0.5 + 1e-9)
                   / 10000.0 AS revenue,
               count(*) AS n_lineitems
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    """,
    "skew_salted_agg": """
        SELECT event_type, count(*) AS n_events,
               floor((sum(value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_value
        FROM events GROUP BY event_type
    """,
}
