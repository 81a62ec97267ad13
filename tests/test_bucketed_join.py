"""Bucketed-table co-located join: the zero-shuffle join strategy for
repeated big⋈big joins (orders⋈customer at 100 TB). Writing both sides
bucketed + sorted on the join key lets SortMergeJoin read buckets
pairwise — no ShuffleExchange on either side, ever again, for any
query joining on that key. This is the physical design a warehouse
team ships once and amortizes across every downstream model."""

import pyspark.sql.functions as F
import pytest

from dbt_project_spark.sources import load_table
from tests.conftest import SF_SMOKE


from tests.conftest import plan_string as _plan  # noqa: E402


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(base / "orders"))
        .saveAsTable("b_orders")
    )
    (
        customer.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(base / "customer"))
        .saveAsTable("b_customer")
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t_orders, t_cust = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(t_orders)
            .join(
                spark.table(t_cust),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # the join itself must be exchange-free: bucket layout replaces
        # the shuffle. The only exchange allowed is the tiny post-join
        # groupBy on c_mktsegment.
        join_section = plan.split("HashAggregate")[0]
        assert "ShuffleExchange" not in join_section
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruning_on_key_predicate(spark, bucketed_tables):
    t_orders, _ = bucketed_tables
    # a bare filter doesn't need the bucket distribution, so the
    # planner's autoBucketedScan turns bucketed reading off; force it
    # on to exercise bucket pruning (1 of 8 files read for a point
    # predicate on the bucket key).
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        plan = _plan(
            spark.table(t_orders).filter(F.col("o_custkey") == 42)
        )
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.set(conf, prev)


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    t_orders, t_cust = bucketed_tables
    bucketed = (
        spark.table(t_orders)
        .join(spark.table(t_cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        load_table(spark, SF_SMOKE, "orders")
        .join(
            load_table(spark, SF_SMOKE, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
