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
