"""Unit tests for the web-traffic operator family (sf0.001 + tiny
hand-computed frames) — mirrors the reference's batch_stream.sql
semantics checks."""

import pyspark.sql.functions as F
import pytest

from dbt_project_spark.operators.bucketize import categorize
from dbt_project_spark.operators.compare import accuracy_summary, compare_frames
from dbt_project_spark.operators.rates import conditional_rate
from dbt_project_spark.operators.windows import (
    two_level_rollup,
    windowed_count_distribution,
)
from tests.conftest import SF_SMOKE


def test_categorize_bounds(spark):
    df = spark.createDataFrame([(0.0,), (49.9,), (50.0,), (149.9,), (150.0,)], ["v"])
    got = [r[0] for r in df.select(
        categorize("v", [50, 150], ["Short", "Medium", "Long"])
    ).collect()]
    assert got == ["Short", "Short", "Medium", "Medium", "Long"]


def test_categorize_validates_labels(spark):
    with pytest.raises(ValueError):
        categorize("v", [1, 2], ["a", "b"])


def test_conditional_rate(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], ["x"])
    row = conditional_rate(df, F.col("x") <= 1, "rate").collect()[0]
    assert row["rate"] == 25.0


def test_windowed_distribution_pct_sums_to_100(spark):
    from dbt_project_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    dist = windowed_count_distribution(ev, "ts", 300, ["event_type"])
    per_window = dist.groupBy("window_start").agg(
        F.round(F.sum("percentage"), 6).alias("s")
    )
    bad = per_window.filter(F.abs(F.col("s") - 100.0) > 0.05).count()
    assert bad == 0


def test_two_level_rollup_equals_direct(spark):
    from dbt_project_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "v100", F.round(F.col("value") * 100, 0).cast("bigint")
    )
    rolled = two_level_rollup(ev, "ts", 60, 300, "v100", ["event_type"])
    from dbt_project_spark.operators.windows import with_tumbling_window

    direct = (
        with_tumbling_window(ev, "ts", 300)
        .groupBy("window_start", "window_end", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("v100").alias("value_sum"))
    )
    assert rolled.exceptAll(direct).count() == 0
    assert direct.exceptAll(rolled).count() == 0


def test_compare_frames_and_accuracy(spark):
    a = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "v"])
    b = spark.createDataFrame([(1, 10.0), (2, 25.0), (4, 40.0)], ["k", "v"])
    cmp = compare_frames(a, b, ["k"], ["v"]).collect()
    by_k = {r["k"]: r for r in cmp}
    assert by_k[1]["is_match"] and not by_k[2]["is_match"]
    assert by_k[3]["v_batch"] is None and by_k[4]["v_stream"] is None
    acc = accuracy_summary(a, b, ["k"], "v", tolerance=5.0).collect()[0]
    # |10-10|<=5 ok, |20-25|<=5 ok, |30-0|>5 no, |0-40|>5 no → 2/4
    assert acc["total_records"] == 4 and acc["matching_records"] == 2
    assert acc["accuracy_percentage"] == 50.0
