"""Streaming parity tests — the reference's methodology (stream vs
batch comparison, comparision.sql) automated: run the availableNow
file-stream pipeline over sf0.001 events and assert the streaming
sinks equal the batch-computed analytics."""

import pyspark.sql.functions as F
import pytest

from dbt_project_spark.sources import load_table
from dbt_project_spark.streaming import (
    join_metric_streams,
    run_file_stream_pipeline,
    split_event_streams,
    synthetic_rate_stream,
)
from dbt_project_spark.streaming.pipeline import micro_batch_analytics
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_join_metric_streams_batch_semantics(spark, events):
    pv, sd, tp = split_event_streams(events)
    joined = join_metric_streams(pv, sd, tp)
    assert joined.count() == events.count()  # keys unique → lossless join
    row = joined.orderBy("record_id").first()
    expected = 0.4 * row["page_views"] + 0.3 * row["session_duration"] + 0.3 * row["time_on_page"]
    assert row["engagement_score"] == pytest.approx(expected)


def test_file_stream_pipeline_matches_batch(spark, events, tmp_path):
    src = str(tmp_path / "src")
    events.write.parquet(src)

    sinks = run_file_stream_pipeline(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )

    # batch-side ground truth through the same operators
    pv, sd, tp = split_event_streams(events)
    batch = micro_batch_analytics(join_metric_streams(pv, sd, tp))

    for name, path in sinks.items():
        got = spark.read.parquet(path)
        want = batch[name]
        assert got.count() == want.count(), name
        assert got.exceptAll(want).count() == 0, name
        assert want.exceptAll(got).count() == 0, name


def test_synthetic_rate_stream_schema(spark):
    df = synthetic_rate_stream(spark, rows_per_second=5)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "record_id", "ts", "page_views", "session_duration", "time_on_page",
    ]


def test_streaming_windowed_agg_availablenow(spark, events, tmp_path):
    """Watermarked windowed aggregation on a real stream equals batch."""
    src = str(tmp_path / "src2")
    events.write.parquet(src)
    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        raw.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("win_agg").selectExpr(
        "window.start AS ws", "event_type", "n"
    )
    want = events.groupBy(
        F.window("ts", "5 minutes").start.alias("ws"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
