"""Relational / scatter-gather operators (reference §2.B B3-B5, A19).

The reference describes scatter-gather query execution — split by
shard, execute locally, merge at coordinator (ARCHITECTURE.md:499-517)
— which is *exactly* Spark's partial+final aggregation: map-side
partial aggregates per partition, one shuffle on the grouping keys,
final merge. Nothing custom is needed; these builders pin the declared
shapes and keep every expression JVM-side.

Scale notes: the Q1-shape aggregation reads only the 7 referenced
columns (column pruning) with the date predicate pushed into the
parquet scan; group-by cardinality is tiny (single digits) so the
shuffle moves only per-partition partial rows — this is the plan that
survives 100 TB unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from torua_spark.functions.compat import round4


def scatter_gather_revenue(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shape pricing summary (declared `scatter_gather_agg`).

    Parity: B3 scatter-gather merge (ARCHITECTURE.md:499-517) + A7-style
    count/sum stats, on the lineitem fact table.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round4(F.sum("l_quantity")).alias("sum_qty"),
            round4(F.sum("l_extendedprice")).alias("sum_base_price"),
            round4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            round4(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            round4(F.avg("l_quantity")).alias("avg_qty"),
            round4(F.avg("l_extendedprice")).alias("avg_price"),
            round4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def json_extract_props(events: DataFrame) -> DataFrame:
    """Declared `json_extract_props` — JSON payload passthrough parity
    (reference stores opaque JSON bodies, internal/cluster/types.go:110-115).

    Extracts `$.k` from the events props JSON and aggregates — stays in
    codegen via get_json_object (no UDF).
    """
    return (
        events.select(
            F.get_json_object(F.col("props"), "$.k").cast("long").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def set_ops_demo(orders: DataFrame) -> DataFrame:
    """Declared `set_ops` — union/intersect/except parity (upsert and
    delete in the reference are union + anti-join at heart).

    Customers with open orders and with finished orders: intersect;
    minus those with priority '1-URGENT' anywhere: except. Composed so
    the result is deterministic and SQL-expressible.
    """
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    finished_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    urgent_c = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return open_c.intersect(finished_c).exceptAll(urgent_c.distinct()).select(
        F.col("o_custkey").alias("custkey")
    )


def skew_report(df, key_col: str, top_k: int = 10):
    """Key-skew diagnostic for any relation: the ``top_k`` heaviest
    keys with their share of the table, plus one summary row
    (key = NULL) carrying distinct-key count and the max/avg skew
    ratio — what you look at before choosing salting/AQE for a
    troublesome join or aggregation key.

    One partial+final count on the key, TakeOrdered for the head,
    1-row broadcast totals; never a global sort."""
    from pyspark.sql import functions as F

    from torua_spark.functions.compat import round4
    from torua_spark.functions.ranking import global_topk

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
        F.avg("n").alias("avg_n"),
    )
    head = (
        global_topk(counts, [F.col("n").desc(), F.col("key").asc()], top_k)
        .crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n",
            round4(F.col("n") / F.col("total")).alias("share"),
            F.lit(None).cast("long").alias("n_keys"),
            F.lit(None).cast("double").alias("skew_ratio"),
        )
    )
    summary = totals.select(
        F.lit(None).cast("string").alias("key"),
        F.col("total").alias("n"),
        F.lit(None).cast("double").alias("share"),
        "n_keys",
        round4(F.col("max_n") / F.col("avg_n")).alias("skew_ratio"),
    )
    return head.drop("rank").unionByName(summary)
