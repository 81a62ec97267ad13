"""Tests for the round-3 retail/mining families: distributed NTILE
equivalence against the native window function, skyline semantics on
planted points, and plan properties (no cartesian products, bounded
exchanges) for the new queries."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from dbt_project_spark.catalog import QUERIES, load_all
from dbt_project_spark.operators.windows import distributed_ntile
from tests.conftest import SF_SMOKE

load_all()


from tests.conftest import plan_string as _plan  # noqa: E402


def _check_ntile_matches(spark, values, k):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "id int, v int")
    native = df.withColumn(
        "t", F.ntile(k).over(Window.orderBy(F.col("v"), F.col("id")))
    )
    two_phase = distributed_ntile(
        df, k, F.col("v"), [F.col("v").asc(), F.col("id").asc()], "t"
    )
    a = sorted(map(tuple, native.select("id", "t").collect()))
    b = sorted(map(tuple, two_phase.select("id", "t").collect()))
    assert a == b, f"k={k} values={values}"


def test_distributed_ntile_matches_native(spark):
    # uneven split (n % k != 0), duplicates across bucket boundaries
    _check_ntile_matches(spark, [5, 3, 3, 8, 1, 9, 3, 7, 2, 2, 6], 4)


def test_distributed_ntile_fewer_rows_than_tiles(spark):
    _check_ntile_matches(spark, [4, 1, 7], 5)


def test_distributed_ntile_exact_split(spark):
    _check_ntile_matches(spark, [10, 20, 30, 40, 50, 60], 3)


def test_distributed_ntile_descending_via_negated_bucket(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([5, 3, 8, 1, 9, 7, 2])], "id int, v int"
    )
    native = df.withColumn(
        "t", F.ntile(3).over(Window.orderBy(F.col("v").desc(), F.col("id")))
    )
    two_phase = distributed_ntile(
        df, 3, -F.col("v"), [F.col("v").desc(), F.col("id").asc()], "t"
    )
    assert sorted(map(tuple, native.select("id", "t").collect())) == sorted(
        map(tuple, two_phase.select("id", "t").collect())
    )


def test_skyline_planted_points(spark):
    # Points: (price, size). Skyline of {(1,5),(2,3),(3,3),(2,8),(4,1),
    # (5,2),(1,5)dup} = (1,5),(2,3),(4,1) with the duplicate kept.
    from dbt_project_spark.queries_retail import part_skyline  # noqa: F401

    pts = [(1, 100, 5), (2, 200, 3), (3, 300, 3), (4, 200, 8), (5, 400, 1),
           (6, 500, 2), (7, 100, 5)]
    p = spark.createDataFrame(pts, "p_partkey int, price100 bigint, p_size int")
    pm = p.groupBy("price100").agg(F.min("p_size").alias("msize"))
    w = Window.orderBy("price100").rowsBetween(Window.unboundedPreceding, -1)
    sky = (
        pm.withColumn("prev_min", F.min("msize").over(w))
        .filter(F.col("prev_min").isNull() | (F.col("msize") < F.col("prev_min")))
        .select("price100", F.col("msize").alias("p_size"))
    )
    got = sorted(
        r.p_partkey for r in p.join(sky, ["price100", "p_size"]).collect()
    )
    assert got == [1, 2, 5, 7]


def test_skyline_plan_has_no_cartesian(spark):
    plan = _plan(QUERIES["part_skyline"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_abc_windows_share_one_partitioning(spark):
    # the running-sum and brand-total windows must reuse one brand
    # exchange: 1 agg shuffle + 1 window shuffle (+ broadcast for the
    # dim join) — anything more means the windows stopped sharing.
    plan = _plan(QUERIES["abc_parts_by_brand"](spark, SF_SMOKE))
    n_shuffles = plan.count("ShuffleExchange") // 2 or plan.count(
        "Exchange hashpartitioning"
    )
    assert n_shuffles <= 2, f"expected <=2 shuffles, plan has {n_shuffles}"


def test_rfm_segments_cover_all_customers(spark):
    rows = QUERIES["rfm_segmentation"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r.r_q <= 5 and 1 <= r.f_q <= 5 and 1 <= r.m_q <= 5
        assert r.segment == f"{r.r_q}{r.f_q}{r.m_q}"


def test_cms_overcount_nonnegative(spark):
    # CMS can only overcount: est >= exact for every reported user.
    rows = QUERIES["cms_heavy_hitters"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r.overcount >= 0 for r in rows)


def test_interval_merge_planted(spark):
    """Hand-checkable interval union: [0,10],[5,15] merge; [30,40]
    separate; touching [40,50] merges with it."""
    import dbt_project_spark.queries_temporal  # noqa: F401
    from pyspark.sql import Window

    rows = [(1, 0, 10), (1, 5, 15), (1, 30, 40), (1, 40, 50), (2, 100, 110)]
    e = spark.createDataFrame(rows, "user_id int, s bigint, f bigint")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("s", "f")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.max("f").over(wp)
    g = e.withColumn(
        "ni", F.when(prev.isNull() | (F.col("s") > prev), 1).otherwise(0)
    )
    wi = (
        Window.partitionBy("user_id")
        .orderBy("s", "f")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = (
        g.withColumn("island", F.sum("ni").over(wi))
        .groupBy("user_id", "island")
        .agg((F.max("f") - F.min("s")).alias("span"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_islands"), F.sum("span").alias("covered"))
    )
    got = {r.user_id: (r.n_islands, r.covered) for r in m.collect()}
    assert got == {1: (2, 35), 2: (1, 10)}


def test_attribution_purchases_covered(spark):
    from dbt_project_spark.catalog import QUERIES

    rows = QUERIES["attribution_last_touch"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(
        (r.attributed_type == "none") == (r.seconds_since_touch is None)
        for r in rows
    )
    assert all(
        r.seconds_since_touch is None or r.seconds_since_touch >= 0 for r in rows
    )


def test_bloom_semijoin_plan_all_broadcast(spark):
    # the 1-row bitmap and scalar aggregates must broadcast; any
    # SortMergeJoin or CartesianProduct means the runtime-filter
    # pattern collapsed into a real shuffle join.
    plan = _plan(QUERIES["bloom_semijoin_orders"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan
