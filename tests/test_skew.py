"""AQE skew-join handling: with a synthetic hot key and lowered skew
thresholds, the adaptive plan splits the skewed partition — the final
plan carries SortMergeJoin(skew=true) — and results stay correct.

Note: the adaptive FINAL plan is only attached to the QueryExecution
that actually ran, so the asserted DataFrame itself is collected (an
action on a derived frame plans separately and shows isFinalPlan=false).
"""

from pyspark.sql import functions as F

from torua_spark.plans import plan_string


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # ~99% of 200k rows on one hot key; the rest spread over 64 keys.
        left = spark.range(0, 200_000, 1, 16).select(
            F.when(F.col("id") % 100 < 99, F.lit(0)).otherwise(F.col("id") % 64).alias("k"),
            F.concat(F.lit("payload-payload-payload-"), F.col("id")).alias("payload"),
        )
        right = spark.range(64).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        joined = left.join(right, "k")
        rows = joined.collect()
        hot = sum(1 for r in rows if r["k"] == 0)
        assert hot == 198_000  # 99 of every 100 ids
        assert len(rows) == 200_000
        assert "skew=true" in plan_string(joined), plan_string(joined)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
