"""Join-strategy tests: salted == plain, bucketed range == naive,
bucketed tables join with zero exchanges."""

import pyspark.sql.functions as F

from dbt_project_spark.operators.joins import (
    broadcast_dim_join,
    bucketed_range_join,
    salted_join,
    write_bucketed,
)
from dbt_project_spark.sources import load_table
from tests.conftest import SF_SMOKE


from tests.conftest import plan_string as _plan  # noqa: E402


def test_broadcast_dim_join_plan_and_result(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    supp = load_table(spark, SF_SMOKE, "supplier")
    j = broadcast_dim_join(li, supp, li.l_suppkey == supp.s_suppkey)
    assert "BroadcastHashJoin" in _plan(j)
    assert j.count() == li.count()


def test_salted_join_equals_plain_join(spark):
    # skewed left: 90% of rows share key 1
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame([(1, "hot"), (901, "cold")], ["k", "v"])
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", n_salts=4)
    assert salted.count() == plain.count() == 901
    assert salted.select("k", "payload", "v").exceptAll(
        plain.select("k", "payload", "v")
    ).count() == 0


def test_bucketed_range_join_equals_naive(spark):
    points = spark.range(0, 500).select(F.col("id").alias("t"))
    intervals = spark.createDataFrame(
        [(0, 10, 49), (1, 45, 60), (2, 300, 310), (3, 499, 520)],
        ["iv_id", "lo", "hi"],
    )
    fast = bucketed_range_join(points, intervals, "t", "lo", "hi", bucket_width=32)
    naive = points.crossJoin(intervals).filter(
        (F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi"))
    )
    assert fast.count() == naive.count()
    assert fast.exceptAll(naive).count() == 0


def test_bucketed_tables_join_without_exchange(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(li, "b_lineitem", "o_orderkey", 8)
    # hint("merge"): at smoke scale the planner would broadcast these
    # tiny tables; at 100 TB SMJ-over-buckets is the default — the
    # hint makes the test exercise that path.
    j = spark.table("b_orders").hint("merge").join(
        spark.table("b_lineitem"), "o_orderkey"
    )
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: layout replaced the shuffle
    assert j.count() == li.count()


def test_bloom_filter_no_false_negatives(spark):
    from dbt_project_spark.operators.joins import (
        bloom_filter_build,
        bloom_might_contain,
    )

    keys = spark.createDataFrame([(i,) for i in range(0, 200, 2)], "k bigint")
    probe = spark.createDataFrame([(i,) for i in range(200)], "k bigint")
    bm = bloom_filter_build(keys, "k", m_bits=4096, k_hashes=3)
    got = {r.k for r in bloom_might_contain(probe, "k", bm, 4096, 3).collect()}
    members = set(range(0, 200, 2))
    # every member passes (no false negatives); non-members may leak
    # through but never the other way around
    assert members <= got
    fp = got - members
    assert len(fp) < 20  # 100 keys in 4096 bits, k=3: FP rate ~1e-3


def test_bloom_bitmap_is_broadcast_single_row(spark):
    from dbt_project_spark.operators.joins import bloom_filter_build

    keys = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
    rows = bloom_filter_build(keys, "k", m_bits=1024, k_hashes=2).collect()
    assert len(rows) == 1
    assert len(rows[0].bitmap) == 1024 // 64
