"""spark.sql surface parity: the engine's tables register as views and
plain ANSI SQL over them matches the DataFrame operators — the "or
just write SQL" half of the DataFrame/SQL API promise.
"""

from pyspark.sql import functions as F

from torua_spark.sources.catalog import register_views


def test_sql_matches_dataframe_results(spark, sf_dir):
    register_views(spark, sf_dir)

    # Q1-shape aggregation (scatter_gather_agg's core)
    sql = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """)
    df = (
        spark.table("lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))

    # Exact dedup in SQL (keep min doc_id per text digest)
    sql_dedup = spark.sql("""
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """)
    from torua_spark.operators.dedup import exact_dedup

    assert sorted(map(tuple, sql_dedup.collect())) == sorted(
        map(tuple, exact_dedup(spark.table("documents")).collect())
    )

    # Window + join in SQL (per-user latest event)
    sql_latest = spark.sql("""
        SELECT user_id, event_id FROM (
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS r
            FROM events
        ) WHERE r = 1
    """)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    df_latest = (
        spark.table("events")
        .withColumn("r", F.row_number().over(w))
        .filter("r = 1")
        .select("user_id", "event_id")
    )
    assert sorted(map(tuple, sql_latest.collect())) == sorted(
        map(tuple, df_latest.collect())
    )
