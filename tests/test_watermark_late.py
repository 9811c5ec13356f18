"""True late-data watermark semantics across micro-batches: an event
older than the watermark is dropped; an equally-late-looking event
within the watermark is kept.

Mechanics pinned by this test (and worth knowing):
- complete mode never drops late rows — update mode does;
- the watermark advances from a batch's max event time but is applied
  with a one-batch lag, so the late row arrives two batches after the
  event time that advanced the watermark;
- maxFilesPerTrigger needs flat files (one parquet file per batch) —
  per-write subdirectories defeat the per-file trigger.
"""

import glob
import shutil
import time

from pyspark.sql import functions as F, types as T

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("k", T.StringType()),
])


def test_watermark_drops_only_too_late_rows(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()

    def write(rows, name):
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, "ts string, k string").select(
            F.col("ts").cast("timestamp").alias("ts"), "k"
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], str(src / f"{name}.parquet"))

    # b1 advances max event time to 12:00 => watermark 11:50.
    write([("2024-01-01 10:00:10", "a"),
           ("2024-01-01 10:30:10", "a"),
           ("2024-01-01 12:00:00", "a")], "b1")
    time.sleep(1.2)
    # b2: a batch boundary so the 11:50 watermark is in force for b3.
    write([("2024-01-01 12:01:00", "a")], "b2")
    time.sleep(1.2)
    # b3: one row beyond the watermark (drop), one within (keep), one on time.
    write([("2024-01-01 10:00:20", "a"),
           ("2024-01-01 11:55:00", "a"),
           ("2024-01-01 12:05:00", "a")], "b3")

    stream = (
        spark.readStream.format("parquet").schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("h"), "n")
    )

    batches = {}

    def capture(df, epoch_id):
        batches[epoch_id] = sorted((r["h"], r["n"]) for r in df.collect())

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = agg.writeStream.outputMode("update").foreachBatch(capture).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    assert batches[0] == [("10:00", 2), ("12:00", 1)]
    assert batches[1] == [("12:00", 2)]
    # the 10:00:20 late row is DROPPED: no 10:00 update in batch 2;
    # 11:55 (within watermark) and 12:05 are aggregated.
    assert batches[2] == [("11:00", 1), ("12:00", 3)]
