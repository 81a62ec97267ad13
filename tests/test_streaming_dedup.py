"""Streaming deduplication: dropDuplicates within a watermark — the
streaming form of dedup_exact (state = seen keys, expired by event
time, so state is bounded by rate × watermark horizon)."""

import pyspark.sql.functions as F


def test_streaming_drop_duplicates(spark, tmp_path):
    # events with planted duplicate event_ids across the stream
    base = spark.range(0, 100).select(
        (F.col("id") % 60).alias("event_id"),  # 40 duplicate keys
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        (F.col("id") * 1.5).alias("value"),
    )
    src = str(tmp_path / "src")
    base.write.parquet(src)

    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    deduped = raw.withWatermark("ts", "10 minutes").dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_stream")
    assert got.count() == 60  # one row per distinct key
    assert got.select("event_id").distinct().count() == 60
