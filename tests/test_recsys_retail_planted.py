"""Planted-semantics tests for the r4s4 retail/recsys/graph additions:
known purchase gaps, a constructed constant-elasticity demand curve, a
hand-traceable item-CF recommendation, and per-node triangle counts on
closed-form graphs."""

import math

from pyspark.sql import functions as F

DAY = 86400
T0 = 1_700_000_000 - (1_700_000_000 % DAY)


def _write_orders(spark, path, rows):
    """rows: (o_orderkey, o_custkey, day_offset)"""
    df = spark.createDataFrame(
        [(int(k), int(c), "O", 100.0, float(T0 + d * DAY), "1-URGENT")
         for k, c, d in rows],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, __ep double, o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.timestamp_seconds(F.col("__ep")).alias("o_orderdate"),
        "o_orderpriority",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(path / "orders.parquet"))


def _write_lineitem(spark, path, rows):
    """rows: (l_orderkey, l_partkey, l_quantity, l_extendedprice)"""
    df = spark.createDataFrame(
        [(int(o), int(p), int(p), 1, float(q), float(e), 0.0, 0.0,
          "N", "O", float(T0))
         for o, p, q, e in rows],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, __ep double",
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
        F.timestamp_seconds(F.col("__ep")).alias("l_shipdate"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(path / "lineitem.parquet")
    )


def _write_part(spark, path, rows):
    """rows: (p_partkey, p_retailprice)"""
    df = spark.createDataFrame(
        [(int(k), f"part{k}", "B", "T", 1, float(pr)) for k, pr in rows],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(path / "part.parquet"))


def test_repurchase_intervals_known_gaps(spark, tmp_path):
    """c1 orders at days 0/10/30 (gaps 10, 20); c2 orders once."""
    from dbt_project_spark.queries_retail import repurchase_intervals

    _write_orders(
        spark, tmp_path, [(1, 1, 0), (2, 1, 10), (3, 1, 30), (4, 2, 5)]
    )
    r = repurchase_intervals(spark, str(tmp_path)).collect()[0]
    assert r["n_customers"] == 2
    assert r["n_repeat_customers"] == 1
    assert r["n_gaps"] == 2
    assert r["mean_gap_micro"] == 15_000_000
    assert r["p50_gap_days"] == 15.0
    assert r["p90_gap_days"] == 19.0  # 10 + 0.9*(20-10)


def test_price_elasticity_planted_constant_elasticity(spark, tmp_path):
    """qty = C/price²: the log-log slope must be ≈ −2 (exactly the
    rational the micro-log pipeline produces — replicated here)."""
    from dbt_project_spark.queries_retail import price_elasticity_parts

    # (partkey, price_dollars, qty): qty = 16e6 / price_cents²-ish
    parts = [(1, 1.00, 1600), (2, 2.00, 400), (3, 4.00, 100)]
    _write_part(spark, tmp_path, [(k, pr) for k, pr, _ in parts])
    _write_lineitem(
        spark, tmp_path, [(k, k, q, 1.0) for k, _, q in parts]
    )
    row = price_elasticity_parts(spark, str(tmp_path)).collect()[0]
    assert row["n_parts"] == 3
    # replicate the integer pipeline
    xs = [round(math.log(round(pr * 100)) * 1e6) for _, pr, _ in parts]
    ys = [round(math.log(q) * 1e6) for _, _, q in parts]
    x0, y0 = min(xs), min(ys)
    xs = [x - x0 for x in xs]
    ys = [y - y0 for y in ys]
    n = 3
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    assert row["elasticity_num"] == str(num)
    assert row["elasticity_den"] == str(den)
    assert abs(num / den + 2.0) < 1e-4


def test_user_item_recs_hand_traceable(spark, tmp_path):
    """Parts 1,2 co-occur twice; cust 12 owns only part 1 → the single
    rec is part 2 with score 4e6/(3·2)."""
    from dbt_project_spark.queries_graph import user_item_recs

    _write_orders(spark, tmp_path, [(1, 10, 0), (2, 11, 0), (3, 12, 0)])
    _write_lineitem(
        spark,
        tmp_path,
        [
            (1, 1, 1, 1.0), (1, 2, 1, 1.0),
            (2, 1, 1, 1.0), (2, 2, 1, 1.0),
            (3, 1, 1, 1.0),
        ],
    )
    out = user_item_recs(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["custkey"] == 12 and r["rec_partkey"] == 2
    assert r["score_micro"] == (2 * 2 * 1_000_000) // (3 * 2)
    assert r["n_paths"] == 1 and r["rec_rank"] == 1


def test_triangles_per_node_k4_and_path(spark):
    from dbt_project_spark.operators.graph import triangles_per_node

    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], "u bigint, v bigint"
    )
    out = {r["node"]: r["tri"] for r in triangles_per_node(k4).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}

    path = spark.createDataFrame([(1, 2), (2, 3)], "u bigint, v bigint")
    assert triangles_per_node(path).count() == 0


def test_segment_migration_swapped_terciles(spark, tmp_path):
    """3 customers with spends 1/2/3 in H1 and 3/2/1 in H2: the
    matrix is exactly low→high, mid→mid, high→low."""
    from dbt_project_spark.queries_retail import segment_migration_matrix

    # orders at day 0 (H1) and day 20 (H2); midpoint splits at day 10
    rows = [
        (1, 1, 0, 1.0), (2, 2, 0, 2.0), (3, 3, 0, 3.0),
        (4, 1, 20, 3.0), (5, 2, 20, 2.0), (6, 3, 20, 1.0),
    ]
    spark.createDataFrame(
        [(k, c, "O", v, float(T0 + d * DAY), "1-URGENT")
         for k, c, d, v in rows],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, __ep double, o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.timestamp_seconds(F.col("__ep")).alias("o_orderdate"),
        "o_orderpriority",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {
        (r["seg_from"], r["seg_to"]): r
        for r in segment_migration_matrix(spark, str(tmp_path)).collect()
    }
    assert set(out) == {("low", "high"), ("mid", "mid"), ("high", "low")}
    for r in out.values():
        assert r["n_customers"] == 1
        assert r["share_micro"] == 1_000_000 // 3


def test_revenue_bridge_identity_by_hand(spark, tmp_path):
    """part1: price 100→120 c, qty 2→4 → volume 200, price 80;
    part2 new (+50); part3 discontinued (−30); residual 0."""
    from dbt_project_spark.queries_retail import revenue_bridge_pvm

    data = [
        (100, 1, 1, 1, 2.0, 2.00, 0.0, 0.0, "N", "O", float(T0 + 0 * DAY)),
        (101, 1, 1, 1, 4.0, 4.80, 0.0, 0.0, "N", "O", float(T0 + 20 * DAY)),
        (102, 2, 2, 1, 1.0, 0.50, 0.0, 0.0, "N", "O", float(T0 + 20 * DAY)),
        (103, 3, 3, 1, 1.0, 0.30, 0.0, 0.0, "N", "O", float(T0 + 0 * DAY)),
    ]
    spark.createDataFrame(
        data,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, __ep double",
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
        F.timestamp_seconds(F.col("__ep")).alias("l_shipdate"),
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    r = revenue_bridge_pvm(spark, str(tmp_path)).collect()[0]
    assert r["rev1_cents"] == 230 and r["rev2_cents"] == 530
    assert r["delta_cents"] == 300
    assert r["volume_cents"] == 200
    assert r["price_cents"] == 80
    assert r["new_cents"] == 50
    assert r["discontinued_cents"] == -30
    assert r["residual_cents"] == 0
