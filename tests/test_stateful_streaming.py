"""applyInPandasWithState: streaming per-key state equals batch agg."""

import pyspark.sql.functions as F

from dbt_project_spark.sources import load_table
from dbt_project_spark.streaming.stateful import user_profile_stream
from tests.conftest import SF_SMOKE


def test_stateful_profile_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)

    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    q = (
        user_profile_stream(raw)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update-mode memory sink may hold one row per key per batch; the
    # final state per key is the row with the max n_events
    got = (
        spark.table("profiles")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value100").alias("total_value100"),
            F.max("last_epoch").alias("last_epoch"),
        )
    )
    want = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("total_value100"),
        F.max(F.unix_timestamp("ts")).alias("last_epoch"),
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stateful_accumulates_across_batches(spark, tmp_path):
    """Two availableNow runs over a growing directory share checkpointed
    state: the second run's profiles include the first run's counts."""
    half1 = spark.range(0, 50).select(
        F.lit(1).alias("user_id"),
        F.lit(100.0).alias("value"),
        F.timestamp_seconds(F.col("id") + 1_700_000_000).alias("ts"),
    )
    half2 = spark.range(50, 80).select(
        F.lit(1).alias("user_id"),
        F.lit(100.0).alias("value"),
        F.timestamp_seconds(F.col("id") + 1_700_000_000).alias("ts"),
    )
    src = str(tmp_path / "grow")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "profiles_out")
    half1.write.mode("append").parquet(src)

    def run():
        raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = (
            user_profile_stream(raw)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, _epoch: df.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    half2.write.mode("append").parquet(src)
    run()  # memory sink can't recover a checkpoint; foreachBatch can
    final = spark.read.parquet(out).agg(F.max("n_events")).collect()[0][0]
    assert final == 80  # state carried 50 from run one, added 30


def test_stateful_sessionizer_closed_sessions(spark, tmp_path):
    """Custom applyInPandasWithState sessionizer emits exactly the
    batch-derived closed sessions once the watermark passes them.

    Three availableNow runs over one checkpoint: run 1 carries the
    real sessions (in-batch gap closures emit immediately; the last
    session per user stays open in state), runs 2-3 append far-future
    sentinel events whose advancing watermark fires the event-time
    timeouts for everything left open.
    """
    from dbt_project_spark.streaming.stateful import session_stream

    T0 = 1_700_000_000
    rows = [
        # user 1, session A: 3 events, then >30min gap
        (1, T0 + 0), (1, T0 + 10), (1, T0 + 20),
        # user 1, session B: 2 events
        (1, T0 + 5000), (1, T0 + 5010),
        # user 2: single-event session
        (2, T0 + 100),
    ]
    sentinel1 = [(99, T0 + 100_000)]
    sentinel2 = [(99, T0 + 200_000)]

    def write(batch, name):
        df = spark.createDataFrame(batch, "user_id bigint, ep bigint").select(
            "user_id", F.timestamp_seconds(F.col("ep")).alias("ts")
        )
        df.write.mode("append").parquet(str(tmp_path / "src"))

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sessions_out")

    def run():
        raw = (
            spark.readStream.schema("user_id bigint, ts timestamp")
            .parquet(src)
            .withWatermark("ts", "10 seconds")
        )
        q = (
            session_stream(raw)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, _e: df.write.mode("append").parquet(out))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write(rows, "r1"); run()
    write(sentinel1, "r2"); run()
    write(sentinel2, "r3"); run()

    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .filter(F.col("user_id") != 99)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
    }
    want = {
        (1, T0 + 0, T0 + 20, 3),
        (1, T0 + 5000, T0 + 5010, 2),
        (2, T0 + 100, T0 + 100, 1),
    }
    assert got == want
