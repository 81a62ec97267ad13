"""Planted replica tests, r07 batch 2: the window/rollup/pivot SQL
shapes that remained on ORACLE_GATE_ONLY after the r07 algorithmic
burn-down (lag/moving-avg/top-k/percent-rank windows, CUBE and ROLLUP
grouping sets, weekday seasonality, exact daily distincts,
interpolated percentiles, JSON-path stats). One shared planted events
fixture; every expectation recomputed in plain Python, including
Spark's ROUND semantics (HALF_UP on the double's shortest repr).
"""

import math
import os
from datetime import datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal

import pytest

from dbt_project_spark.catalog import QUERIES, load_all

load_all()

D1 = datetime(2024, 1, 1)  # Monday (ISO dow 1)
D2 = datetime(2024, 1, 2)  # Tuesday


def _round6(x: float) -> float:
    # Spark F.round on a double: BigDecimal.valueOf(double) uses the
    # SHORTEST string repr, then setScale(6, HALF_UP).
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           ROUND_HALF_UP))


def _pctile(sorted_vals, q):
    n = len(sorted_vals)
    pos = (n - 1) * q
    lo = int(math.floor(pos))
    hi = min(lo + 1, n - 1)
    return sorted_vals[lo] + (pos - lo) * (sorted_vals[hi] - sorted_vals[lo])


# (eid, ts, uid, type, value, k) — k goes into props JSON
_ROWS = [
    (1, D1 + timedelta(minutes=1), 1, "view", 10.00, 5),
    (2, D1 + timedelta(minutes=2), 1, "view", 20.00, 15),
    (3, D1 + timedelta(minutes=3), 1, "view", 5.50, 25),
    (4, D1 + timedelta(minutes=4), 1, "view", 40.00, 99),
    (5, D1 + timedelta(minutes=5), 1, "view", 5.50, 3),
    (6, D1 + timedelta(minutes=6), 1, "view", 30.00, 42),
    (7, D1 + timedelta(minutes=7), 1, "view", 8.25, 7),
    (8, D1 + timedelta(hours=10), 2, "purchase", 100.00, 0),
    (9, D1 + timedelta(hours=11), 2, "purchase", 50.25, 10),
    (10, D2 + timedelta(hours=9), 2, "purchase", 75.00, 55),
    (11, D2 + timedelta(hours=10), 2, "purchase", 100.00, 100),
    (12, D2 + timedelta(hours=12), 3, "error", 7.77, 9),
]


@pytest.fixture(scope="module")
def ev2_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r07s2_planted") / "sf")
    rows = [
        (eid, ts, uid, et, v, '{"k": %d}' % k)
        for (eid, ts, uid, et, v, k) in _ROWS
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


def _per_user_ordered():
    by_user = {}
    for eid, ts, uid, _et, v, _k in _ROWS:
        by_user.setdefault(uid, []).append((ts, eid, int(round(v * 100))))
    for rows in by_user.values():
        rows.sort()
    return by_user


def test_win_lag_delta_planted(spark, ev2_dir):
    got = {
        r["event_id"]: r["delta_value"]
        for r in QUERIES["win_lag_delta"](spark, ev2_dir).collect()
    }
    want = {}
    for rows in _per_user_ordered().values():
        prev = None
        for _ts, eid, v100 in rows:
            want[eid] = None if prev is None else (v100 - prev) / 100.0
            prev = v100
    assert got == want


def test_win_moving_avg_planted(spark, ev2_dir):
    got = {
        r["event_id"]: r["moving_avg_5"]
        for r in QUERIES["win_moving_avg"](spark, ev2_dir).collect()
    }
    want = {}
    for rows in _per_user_ordered().values():
        vals = [v for _t, _e, v in rows]
        for i, (_ts, eid, _v) in enumerate(rows):
            window = vals[max(0, i - 4):i + 1]
            want[eid] = sum(window) / (len(window) * 100.0)
    assert got == want


def test_win_top3_per_user_planted(spark, ev2_dir):
    got = {
        (r["user_id"], r["rn"]): (r["event_id"], r["value"])
        for r in QUERIES["win_top3_per_user"](spark, ev2_dir).collect()
    }
    want = {}
    by_user = {}
    for eid, _ts, uid, _et, v, _k in _ROWS:
        by_user.setdefault(uid, []).append((-v, eid))
    for uid, rows in by_user.items():
        for rn, (negv, eid) in enumerate(sorted(rows)[:3], start=1):
            want[(uid, rn)] = (eid, -negv)
    assert got == want


def test_win_percent_rank_ntile_planted(spark, ev2_dir):
    got = {
        r["event_id"]: (r["pct_rank"], r["quartile"])
        for r in QUERIES["win_percent_rank_ntile"](spark, ev2_dir).collect()
    }
    by_type = {}
    for eid, _ts, _u, et, v, _k in _ROWS:
        by_type.setdefault(et, []).append((int(round(v * 100)), eid))
    want = {}
    for rows in by_type.values():
        rows.sort()
        n = len(rows)
        # ntile(4): first (n % 4) tiles get ceil(n/4) rows
        base, extra = divmod(n, 4)
        sizes = [base + (1 if i < extra else 0) for i in range(4)]
        tile_of = []
        for t, sz in enumerate(sizes, start=1):
            tile_of += [t] * sz
        for i, (_v, eid) in enumerate(rows):
            pr = 0.0 if n == 1 else _round6(i / (n - 1))
            want[eid] = (pr, tile_of[i])
    assert got == want


def _grouped(keysel):
    agg = {}
    for eid, ts, _u, et, v, _k in _ROWS:
        key = keysel(et, ts.strftime("%Y-%m-%d"))
        n, s = agg.get(key, (0, 0))
        agg[key] = (n + 1, s + int(round(v * 100)))
    return agg


def test_rollup_type_daily_planted(spark, ev2_dir):
    got = {
        (r["event_type"], r["day"]): (r["n_events"], r["total_value"])
        for r in QUERIES["rollup_type_daily"](spark, ev2_dir).collect()
    }
    want = {}
    for sel in [
        lambda et, d: (et, d),
        lambda et, d: (et, None),
        lambda et, d: (None, None),
    ]:
        for key, (n, s) in _grouped(sel).items():
            want[key] = (n, s / 100.0)
    assert got == want


def test_cube_type_daily_planted(spark, ev2_dir):
    got = {
        (r["event_type"], r["day"]): (r["n_events"], r["total_value"])
        for r in QUERIES["cube_type_daily"](spark, ev2_dir).collect()
    }
    want = {}
    for sel in [
        lambda et, d: (et, d),
        lambda et, d: (et, None),
        lambda et, d: (None, d),
        lambda et, d: (None, None),
    ]:
        for key, (n, s) in _grouped(sel).items():
            want[key] = (n, s / 100.0)
    assert got == want
    # the (None, day) subtotal rows are what CUBE adds over ROLLUP
    assert (None, "2024-01-01") in got and (None, "2024-01-02") in got


def test_distinct_users_daily_planted(spark, ev2_dir):
    got = {
        r["day"]: (r["n_users"], r["n_events"])
        for r in QUERIES["distinct_users_daily"](spark, ev2_dir).collect()
    }
    days = {}
    for _e, ts, uid, _t, _v, _k in _ROWS:
        d = ts.strftime("%Y-%m-%d")
        users, n = days.get(d, (set(), 0))
        users.add(uid)
        days[d] = (users, n + 1)
    assert got == {d: (len(u), n) for d, (u, n) in days.items()}
    assert got["2024-01-01"] == (2, 9)  # users 1+2; 7 views + 2 buys


def test_percentiles_by_type_planted(spark, ev2_dir):
    got = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in QUERIES["percentiles_by_type"](spark, ev2_dir).collect()
    }
    by_type = {}
    for _e, _ts, _u, et, v, _k in _ROWS:
        by_type.setdefault(et, []).append(int(round(v * 100)))
    want = {
        et: tuple(
            _round6(_pctile(sorted(vals), q) / 100.0)
            for q in (0.5, 0.9, 0.99)
        )
        for et, vals in by_type.items()
    }
    assert got == want


def test_props_json_stats_planted(spark, ev2_dir):
    got = {
        (r["event_type"], r["k_decile"]): (r["n"], r["k_sum"])
        for r in QUERIES["props_json_stats"](spark, ev2_dir).collect()
    }
    want = {}
    for _e, _ts, _u, et, _v, k in _ROWS:
        key = (et, k // 10)
        n, s = want.get(key, (0, 0))
        want[key] = (n + 1, s + k)
    assert got == want
    assert ("purchase", 10) in got  # k=100 lands in decile 10


def test_pipeline_nation_revenue_planted(spark, tmp_path_factory):
    """The staging→marts DAG result replicated in plain Python over a
    planted 4-table micro-warehouse: P-status orders filtered at
    staging, fixed-point revenue ep100·(100−disc100), per-order
    rollup, customer→nation enrichment, (nation, month) mart."""
    d = str(tmp_path_factory.mktemp("dag_planted") / "sf")
    orders = [
        # (okey, custkey, status, totalprice, orderdate, priority)
        (1, 10, "O", 0.0, datetime(1997, 1, 5), "1"),
        (2, 10, "F", 0.0, datetime(1997, 1, 25), "1"),
        (3, 20, "O", 0.0, datetime(1997, 2, 5), "1"),
        (4, 20, "P", 0.0, datetime(1997, 2, 6), "1"),  # filtered at stg
        (5, 30, "F", 0.0, datetime(1997, 2, 9), "1"),
    ]
    li = [
        # (okey, partkey, suppkey, linenumber, qty, extprice, disc, ...)
        (1, 1, 1, 1, 1.0, 100.00, 0.10),
        (1, 2, 1, 2, 1.0, 50.00, 0.00),
        (2, 3, 1, 1, 1.0, 200.00, 0.05),
        (3, 4, 1, 1, 1.0, 300.00, 0.00),
        (4, 5, 1, 1, 1.0, 999.00, 0.00),  # parent filtered out
        (5, 6, 1, 1, 1.0, 80.00, 0.25),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        [(k, p, s, ln, q, ep, disc, 0.0, "N", "O", datetime(1997, 3, 1))
         for (k, p, s, ln, q, ep, disc) in li],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [(10, "c10", 0, 0.0, "BUILDING"), (20, "c20", 0, 0.0, "BUILDING"),
         (30, "c30", 1, 0.0, "AUTOMOBILE")],
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        [(0, "BRAZIL", 0), (1, "JAPAN", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.parquet(os.path.join(d, "nation.parquet"))
    got = {
        (r["nation"], r["order_month"]): (r["n_orders"], r["revenue"])
        for r in QUERIES["pipeline_nation_revenue"](spark, d).collect()
    }
    # replica
    nation = {10: "BRAZIL", 20: "BRAZIL", 30: "JAPAN"}
    month = {1: "1997-01", 2: "1997-01", 3: "1997-02", 5: "1997-02"}
    cust = {1: 10, 2: 10, 3: 20, 5: 30}
    rev = {}
    for okey, _p, _s, _ln, _q, ep, disc in li:
        if okey not in month:  # order 4 filtered at staging
            continue
        rev[okey] = rev.get(okey, 0) + int(round(ep * 100)) * (
            100 - int(round(disc * 100))
        )
    want = {}
    for okey, r10000 in rev.items():
        key = (nation[cust[okey]], month[okey])
        n, s = want.get(key, (0, 0))
        want[key] = (n + 1, s + r10000)
    want = {k: (n, s / 10000.0) for k, (n, s) in want.items()}
    assert got == want
    # hand numbers: order 1 = 100·0.90 + 50 = 140; order 2 = 200·0.95
    # = 190 → BRAZIL/1997-01 = (2 orders, 330.0)
    assert want[("BRAZIL", "1997-01")] == (2, 330.0)


def test_weekday_seasonality_planted(spark, ev2_dir):
    got = {
        (r["event_type"], r["dow"]): (
            r["n"], r["total_value"], r["seasonality_idx"]
        )
        for r in QUERIES["weekday_seasonality"](spark, ev2_dir).collect()
    }
    cell, tot = {}, {}
    for _e, ts, _u, et, v, _k in _ROWS:
        v100 = int(round(v * 100))
        dow = ts.isoweekday()
        n, s = cell.get((et, dow), (0, 0))
        cell[(et, dow)] = (n + 1, s + v100)
        nt, st = tot.get(et, (0, 0))
        tot[et] = (nt + 1, st + v100)
    want = {}
    for (et, dow), (n, s) in cell.items():
        nt, st = tot[et]
        want[(et, dow)] = (
            n, s / 100.0, _round6((s * 1.0 * nt) / (n * 1.0 * st))
        )
    assert got == want
    # view events all fall on Monday → index exactly 1
    assert want[("view", 1)][2] == 1.0
