"""foreachBatch exactly-once sink pattern: stream -> idempotent parquet
write per epoch, verified against the batch read."""

from pyspark.sql import functions as F

from torua_spark.sources.catalog import load_table
from torua_spark.streaming.windows import events_stream


def test_foreachbatch_parquet_sink(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sink")

    def write_epoch(df, epoch_id):
        # Idempotent per-epoch write: overwrite into an epoch-keyed dir
        # (re-delivery of an epoch rewrites the same path, not appends).
        df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    counts = (
        events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(write_epoch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    sunk = {r["event_type"]: r["n"] for r in spark.read.parquet(f"{out}/epoch=0").collect()}
    batch = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sunk == batch
