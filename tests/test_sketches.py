"""Approximate/sketch aggregates — the 100 TB swap-ins for their exact
counterparts in the catalog (kept out of the oracle gate because
sketch outputs are engine-specific; these tests bound their error
against the exact answers instead)."""

import pyspark.sql.functions as F

from dbt_project_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_hll_distinct_within_tolerance(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(0.05 * row["exact"], 2)


def test_approx_percentile_within_tolerance(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    row = ev.agg(
        F.expr("percentile(value, 0.9)").alias("exact"),
        F.expr("approx_percentile(value, 0.9, 1000)").alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_theta_sketch_mergeability(spark):
    """Union of per-day theta sketches == one whole-period sketch: the
    property that lets a 100 TB pipeline keep per-partition sketches and
    answer cross-partition set algebra without rescanning events."""
    ev = load_table(spark, SF_SMOKE, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    merged = daily.agg(
        F.theta_sketch_estimate(F.theta_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    whole = ev.agg(
        F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    exact = ev.select("user_id").distinct().count()
    assert merged == whole
    assert abs(merged - exact) <= max(0.05 * exact, 2)


def test_theta_intersection_vs_exact(spark):
    """Sketch-side intersection and a-not-b track the exact answers."""
    ev = load_table(spark, SF_SMOKE, "events")
    sk = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
    )
    both = sk.groupBy().pivot("event_type", ["purchase", "error"]).agg(
        F.first("sk")
    )
    row = both.select(
        F.theta_sketch_estimate(
            F.theta_intersection("purchase", "error")
        ).alias("inter"),
        F.theta_sketch_estimate(
            F.theta_difference("purchase", "error")
        ).alias("a_not_b"),
    ).collect()[0]
    p = set(
        r["user_id"]
        for r in ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .collect()
    )
    e = set(
        r["user_id"]
        for r in ev.filter(F.col("event_type") == "error")
        .select("user_id")
        .distinct()
        .collect()
    )
    assert abs(row["inter"] - len(p & e)) <= max(0.05 * len(p & e), 2)
    assert abs(row["a_not_b"] - len(p - e)) <= max(0.05 * len(p - e), 2)
