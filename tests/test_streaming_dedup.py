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


def test_streaming_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark (Spark 3.5+): unlike plain
    dropDuplicates (state forever per key unless the event-time column
    is part of the key), state for a key is guaranteed evictable once
    the watermark passes its last occurrence — duplicates are removed
    only WITHIN the horizon, which is the semantics an at-least-once
    ingestion pipeline actually needs (replays arrive close together;
    a legitimate same-key event a day later must NOT be dropped).

    Single availableNow batch: all planted duplicates are within the
    horizon, so output equals distinct keys — parity with the batch
    distinct on the same data."""
    base = spark.range(0, 100).select(
        (F.col("id") % 25).alias("k"),  # every key repeated 4x
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
    )
    src = str(tmp_path / "src2")
    base.write.parquet(src)

    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    deduped = raw.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["k"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_within_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_within_wm")
    batch = spark.read.parquet(src).select("k").distinct()
    assert got.count() == batch.count() == 25
    assert got.select("k").distinct().count() == 25
