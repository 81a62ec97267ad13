"""Topic-shaped streaming parity: the reference's exact three JSON
message schemas (spark_streaming_new.py:21-37), parsed with from_json
from three INDEPENDENT file-stream sources (standing in for the three
Kafka topics), joined on (record_id, timestamp) with watermarks —
the full reference topology minus the broker."""

import json

import pyspark.sql.functions as F
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from dbt_project_spark.streaming import join_metric_streams

SCHEMA_PV = StructType(
    [
        StructField("page_views", IntegerType()),
        StructField("timestamp", StringType()),
        StructField("record_id", IntegerType()),
    ]
)
SCHEMA_SD = StructType(
    [
        StructField("session_duration", FloatType()),
        StructField("timestamp", StringType()),
        StructField("record_id", IntegerType()),
    ]
)
SCHEMA_TP = StructType(
    [
        StructField("time_on_page", FloatType()),
        StructField("timestamp", StringType()),
        StructField("record_id", IntegerType()),
    ]
)


def _write_topic(tmp_path, name, rows):
    d = tmp_path / name
    d.mkdir()
    (d / "part-0.json").write_text("\n".join(json.dumps(r) for r in rows))
    return str(d)


def _json_stream(spark, path, schema):
    """Raw-line file stream parsed with from_json — identical to the
    Kafka reader's CAST(value AS STRING) → from_json pipeline."""
    raw = spark.readStream.schema(
        StructType([StructField("value", StringType())])
    ).text(path)
    return (
        raw.select(F.from_json(F.col("value"), schema).alias("data"))
        .select("data.*")
        .withColumn("ts", F.to_timestamp("timestamp"))
        .drop("timestamp")
    )


def test_three_topic_join_parity(spark, tmp_path):
    n = 50
    base_ts = "2024-02-01 00:{m:02d}:{s:02d}"
    mk_ts = lambda i: base_ts.format(m=i // 60, s=i % 60)
    pv_rows = [
        {"page_views": (i % 9) + 1, "timestamp": mk_ts(i), "record_id": i}
        for i in range(n)
    ]
    sd_rows = [
        {"session_duration": float(10 + i), "timestamp": mk_ts(i), "record_id": i}
        for i in range(n)
    ]
    tp_rows = [
        {"time_on_page": float(5 + i), "timestamp": mk_ts(i), "record_id": i}
        for i in range(n)
    ]
    # drop one message from one topic: that record must NOT join (inner)
    sd_rows = sd_rows[:-1]

    pv = _json_stream(spark, _write_topic(tmp_path, "t_pv", pv_rows), SCHEMA_PV)
    sd = _json_stream(spark, _write_topic(tmp_path, "t_sd", sd_rows), SCHEMA_SD)
    tp = _json_stream(spark, _write_topic(tmp_path, "t_tp", tp_rows), SCHEMA_TP)

    joined = join_metric_streams(pv, sd, tp, watermark="2 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("topic_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("topic_join")
    assert out.count() == n - 1  # the incomplete record dropped by inner join
    r = out.filter("record_id = 10").collect()[0]
    assert r["page_views"] == (10 % 9) + 1
    assert r["engagement_score"] == (
        0.4 * r["page_views"] + 0.3 * r["session_duration"] + 0.3 * r["time_on_page"]
    )
