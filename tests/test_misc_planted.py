"""Planted tests for the remaining events/orders/lineitem catalog
queries (r06 lint burn-down): sketch set-algebra (KMV / theta / HLL
rollup), the salted skew join, Z-order locality, the nearest as-of
join, snapshot CDC diff, and market-basket rules. Every expectation is
recomputed in plain Python from the planted rows (sketches stay below
their exact-mode cardinality, so even the "estimates" are exact).
"""

import math
import os
from datetime import datetime, timedelta

import pytest

from dbt_project_spark.catalog import QUERIES, load_all

load_all()

D1 = datetime(2024, 1, 1)
D2 = datetime(2024, 1, 2)
D3 = datetime(2024, 1, 3)


def _events() -> list[tuple]:
    rows = []
    eid = 0

    def add(ts, user, etype, value):
        nonlocal eid
        rows.append((eid, ts, user, etype, value, '{"k": 1}'))
        eid += 1

    for u in range(1, 101):  # purchase cohort, day 1
        add(D1 + timedelta(minutes=u), u, "purchase", u + 0.25)
    for u in range(51, 151):  # error cohort, day 2
        add(D2 + timedelta(minutes=u), u, "error", u + 0.5)
    # as-of geometry, day 3 (tolerance = 600 s)
    add(D3 + timedelta(hours=10), 201, "error", 201.25)
    add(D3 + timedelta(hours=10, seconds=200), 201, "purchase", 201.25)
    add(D3 + timedelta(hours=10, seconds=1000), 201, "error", 201.25)
    add(D3 + timedelta(hours=11), 202, "purchase", 202.25)
    add(D3 + timedelta(hours=11, seconds=300), 202, "error", 202.25)
    add(D3 + timedelta(hours=12), 203, "purchase", 203.25)
    add(D3 + timedelta(hours=12, seconds=1200), 203, "error", 203.25)
    add(D3 + timedelta(hours=13), 204, "error", 204.25)
    add(D3 + timedelta(hours=13, seconds=100), 204, "purchase", 204.25)
    add(D3 + timedelta(hours=13, seconds=200), 204, "error", 204.25)
    return rows


EVENTS = _events()


@pytest.fixture(scope="module")
def ev_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("misc_planted") / "evsf")
    spark.createDataFrame(
        EVENTS,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


def _users(etype):
    return {u for _, _, u, t, _, _ in EVENTS if t == etype}


def test_kmv_user_overlap_planted(spark, ev_dir):
    # all three sketched sets are below k=256, so estimates are exact
    p, e = _users("purchase"), _users("error")
    rows = QUERIES["kmv_user_overlap"](spark, ev_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["est_purchase_users"] == float(len(p))
    assert r["est_error_users"] == float(len(e))
    assert r["est_union"] == float(len(p | e))
    assert r["est_overlap"] == float(len(p) + len(e) - len(p | e))
    assert r["exact_overlap"] == len(p & e) == 54


def test_theta_set_ops_planted(spark, ev_dir):
    p, e = _users("purchase"), _users("error")
    rows = QUERIES["theta_set_ops"](spark, ev_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["exact_purchase"] == len(p) == 104
    assert r["exact_error"] == len(e) == 104
    assert r["exact_inter"] == len(p & e) == 54
    assert r["exact_a_not_b"] == len(p - e) == 50
    assert r["inter_within_5pct"] and r["a_not_b_within_5pct"]
    assert r["union_within_5pct"]


def test_hll_sketch_rollup_planted(spark, ev_dir):
    rows = QUERIES["hll_sketch_rollup"](spark, ev_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_days"] == 3
    assert r["exact_month_users"] == len({u for _, _, u, _, _, _ in EVENTS})
    assert r["union_within_5pct"] is True


def test_skew_salted_join_planted(spark, ev_dir):
    # salting must reproduce the plain join+aggregate exactly
    want = {}
    for _, _, u, _, v, _ in EVENTS:
        key = 0 if u % 10 < 9 else u
        n, tot = want.get(key, (0, 0))
        want[key] = (n + 1, tot + round(v * 100))
    got = {r["skew_key"]: (r["key_rows"], r["n"], r["total_value"]) for r in
           QUERIES["skew_salted_join"](spark, ev_dir).collect()}
    assert got == {k: (n, n, t / 100.0) for k, (n, t) in want.items()}
    assert got[0][1] == sum(
        1 for _, _, u, _, _, _ in EVENTS if u % 10 < 9
    )  # the planted hot key


def _morton(u: int, v: int) -> int:
    z = 0
    for b in range(16):
        z |= ((u >> b) & 1) << (2 * b)
        z |= ((v >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_locality_planted(spark, ev_dir):
    want = {}
    for _, _, u, _, val, _ in EVENTS:
        uu, vv = u & 65535, round(val * 100) & 65535
        bucket = _morton(uu, vv) >> 24
        if bucket not in want:
            want[bucket] = [0, uu, uu, vv, vv]
        w = want[bucket]
        w[0] += 1
        w[1], w[2] = min(w[1], uu), max(w[2], uu)
        w[3], w[4] = min(w[3], vv), max(w[4], vv)
    got = {r["z_bucket"]: [r["n_rows"], r["u_min"], r["u_max"],
                           r["v_min"], r["v_max"]] for r in
           QUERIES["zorder_locality"](spark, ev_dir).collect()}
    assert got == want


def test_asof_nearest_error_planted(spark, ev_dir):
    # python replica of merge_asof(direction='nearest', tolerance=600s)
    per_user_errors = {}
    for eid, ts, u, t, _, _ in EVENTS:
        if t == "error":
            per_user_errors.setdefault(u, []).append((ts, eid))
    want = {}
    for eid, ts, u, t, _, _ in EVENTS:
        if t != "purchase":
            continue
        before = [(ts - e_ts, e_id) for e_ts, e_id in
                  per_user_errors.get(u, []) if e_ts <= ts
                  and (ts - e_ts).total_seconds() <= 600]
        after = [(e_ts - ts, e_id) for e_ts, e_id in
                 per_user_errors.get(u, []) if e_ts > ts
                 and (e_ts - ts).total_seconds() <= 600]
        b = min(before) if before else None
        a = min(after) if after else None
        if b is not None and (a is None or b[0] <= a[0]):
            want[eid] = ("before", b[1], int(b[0].total_seconds()))
        elif a is not None:
            want[eid] = ("after", a[1], int(a[0].total_seconds()))
        else:
            want[eid] = ("none", -1, -1)
    got = {r["event_id"]: (r["side"], r["nearest_error_id"], r["delta_s"])
           for r in QUERIES["asof_nearest_error"](spark, ev_dir).collect()}
    assert got == want
    # the planted shapes all occurred: nearer-before, after-only,
    # out-of-tolerance, and the equidistant tie (resolves to before)
    sides = [got[eid][0] for eid, _, u, t, _, _ in EVENTS
             if t == "purchase" and u > 200]
    assert sides == ["before", "after", "none", "before"]
    assert got[max(e for e, _, u, t, _, _ in EVENTS
                   if u == 204 and t == "purchase")][2] == 100


@pytest.fixture(scope="module")
def orders_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cdc_orders") / "odsf")
    rows = [
        # key, date, status, price — exercising every diff rule
        (1, "1996-05-01", "O", 10.00),    # unchanged → filtered out
        (29, "1996-05-02", "O", 20.00),   # status flips to 'P'
        (13, "1996-05-03", "F", 10.00),   # price 1000 → 1100 cents
        (97, "1996-05-04", "O", 30.00),   # deleted from new snapshot
        (2, "1997-09-01", "O", 40.00),    # insert (new snapshot only)
        (377, "1996-06-01", "O", 50.00),  # 13·29: both columns change
    ]
    spark.createDataFrame(
        [(k, 5, "x", s, p, dt, "1-URGENT") for k, dt, s, p in rows],
        "o_orderkey bigint, o_custkey bigint, o_name string, "
        "o_orderstatus string, o_totalprice double, o_orderdate string, "
        "o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "cast(o_orderdate as timestamp) o_orderdate", "o_orderpriority",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    return d


def test_table_diff_cdc_planted(spark, orders_dir):
    got = {r["order_id"]: (r["op"], r["changed"], r["status_old"],
                           r["status_new"], r["price100_old"],
                           r["price100_new"]) for r in
           QUERIES["table_diff_cdc"](spark, orders_dir).collect()}
    assert got == {
        29: ("U", "status", "O", "P", 2000, 2000),
        13: ("U", "price100", "F", "F", 1000, 1100),
        97: ("D", "", "O", None, 3000, None),
        2: ("I", "", None, "O", None, 4000),
        377: ("U", "status,price100", "O", "P", 5000, 5500),
    }  # key 1 is unchanged and must not appear


@pytest.fixture(scope="module")
def baskets_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("baskets") / "bksf")
    li = []
    for ok, parts in ((1, (1, 2)), (2, (1, 2)), (3, (1, 2, 3)), (4, (3,))):
        for ln, p in enumerate(parts, start=1):
            li.append((ok, p, 1, ln, 1.0, 100.0, 0.0, 0.0, "N", "O",
                       "1996-01-02 00:00:00"))
    import pyspark.sql.functions as F  # noqa: F401

    spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "cast(l_shipdate as timestamp) l_shipdate",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    return d


def test_basket_rules_planted(spark, baskets_dir):
    # only (1,2) reaches MB_MIN_PAIR=3; both directed rules emitted
    got = {(r["antecedent"], r["consequent"]):
           (r["support_n"], r["confidence"], r["lift"]) for r in
           QUERIES["basket_rules"](spark, baskets_dir).collect()}
    # item counts: part1=3, part2=3; n_orders=4
    lift = round(3 * 4 / (3 * 3), 6)
    assert got == {
        (1, 2): (3, 1.0, lift),
        (2, 1): (3, 1.0, lift),
    }


@pytest.fixture(scope="module")
def shift_dir(spark, tmp_path_factory):
    # 20 days of events: 10/day for days 1-10, then a sustained level
    # shift to 30/day for days 11-20
    d = str(tmp_path_factory.mktemp("cusum_planted") / "cssf")
    rows, eid = [], 0
    for day in range(20):
        rate = 10 if day < 10 else 30
        for j in range(rate):
            rows.append((eid, D1 + timedelta(days=day, minutes=j), 1 + j,
                         "view", 1.25, '{"k": 1}'))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_cusum_changepoint_planted(spark, shift_dir):
    # python replica: S+ = P - min(0, runmin P), S- = max(0, runmax P) - P
    counts = [(10 if day < 10 else 30) for day in range(20)]
    d, sx = len(counts), sum(counts)
    sxx = sum(n * n for n in counts)
    mean_micro = sx * 1_000_000 // d
    sd_micro = round(math.sqrt(d * sxx - sx * sx) / d * 1_000_000)
    pf, run_min, run_max = 0, 0, 0
    want = {}
    for day, n in enumerate(counts):
        pf += n * 1_000_000 - mean_micro
        run_min, run_max = min(run_min, pf), max(run_max, pf)
        cpos = pf - min(0, run_min)
        cneg = max(0, run_max) - pf
        key = (D1 + timedelta(days=day)).strftime("%Y-%m-%d")
        want[key] = (n, cpos, cneg, cpos > 4 * sd_micro,
                     cneg > 4 * sd_micro)
    got = {r["day"]: (r["n_events"], r["cusum_pos_micro"],
                      r["cusum_neg_micro"], r["alarm_pos"], r["alarm_neg"])
           for r in QUERIES["cusum_changepoint"](spark, shift_dir).collect()}
    assert got == want
    # the negative side accumulates during the low regime and the
    # positive side fires after the level shift, never before it
    assert not any(got[k][3] for k in sorted(got)[:10])
    assert any(got[k][3] for k in sorted(got)[10:])


@pytest.fixture(scope="module")
def seasonal_dir(spark, tmp_path_factory):
    # 28 days from a Monday: linear trend + exact weekly pattern whose
    # period sum (49) is divisible by 7, so the centered 7-day MA and
    # the weekday means are exact and the residual is identically zero
    d = str(tmp_path_factory.mktemp("seasonal_planted") / "sssf")
    pattern = [0, 7, 14, 7, 0, 21, 0]  # Mon..Sun additions
    rows, eid = [], 0
    for day in range(28):
        n = 100 + 3 * day + pattern[day % 7]
        for j in range(n):
            rows.append((eid, D1 + timedelta(days=day, seconds=j), 1 + j,
                         "view", 1.25, '{"k": 1}'))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_seasonal_strength_planted(spark, seasonal_dir):
    rows = QUERIES["seasonal_strength"](spark, seasonal_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    # 28 days minus 3 edge days each side
    assert r["n_days_interior"] == 22
    # detrended value depends only on the weekday: (pattern − 7)·10⁶
    pattern = [0, 7, 14, 7, 0, 21, 0]
    dets = [(pattern[(3 + i) % 7] - 7) * 1_000_000 for i in range(22)]
    m, sd1 = len(dets), sum(dets)
    sdd = sum(x * x for x in dets)
    assert r["var_detrended_num"] == str(m * sdd - sd1 * sd1)
    # pure trend + seasonality → zero remainder → strength exactly 1
    assert r["var_resid_num"] == "0"
    assert r["strength_micro"] == 1_000_000


@pytest.fixture(scope="module")
def w1_dir(spark, tmp_path_factory):
    # ref half: values {1.00 x2, 2.00 x2}; cur half: {3.00 x2, 4.00 x2}
    # → W1 between the empirical CDFs is exactly 2.00 value units
    d = str(tmp_path_factory.mktemp("w1_planted") / "w1sf")
    rows, eid = [], 0
    for v in (1.0, 1.0, 2.0, 2.0):
        rows.append((eid, D1 + timedelta(minutes=eid), 1, "view", v,
                     '{"k": 1}'))
        eid += 1
    for v in (3.0, 3.0, 4.0, 4.0):
        rows.append((eid, D3 + timedelta(minutes=eid), 1, "view", v,
                     '{"k": 1}'))
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_wasserstein_value_drift_planted(spark, w1_dir):
    rows = QUERIES["wasserstein_value_drift"](spark, w1_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_ref"], r["n_cur"]) == (4, 4)
    # python replica over the cent grid {100, 200, 300, 400}:
    # |F_ref−F_cur| is 1/2 on [100,200), 1 on [200,300), 1/2 on
    # [300,400) → W1 = 200 cents = 2.0 value units
    grid = [(100, 2, 0), (200, 2, 0), (300, 0, 2), (400, 0, 2)]
    nr = nc = 4
    cumr = cumc = 0
    w1n = 0
    for (v, cr, cc), nxt in zip(grid, [g[0] for g in grid[1:]] + [None]):
        cumr += cr
        cumc += cc
        if nxt is not None:
            w1n += abs(cumr * nc - cumc * nr) * (nxt - v)
    assert r["w1_num"] == str(w1n)
    assert r["w1_value_micro"] == w1n * 10_000 // (nr * nc) == 2_000_000


@pytest.fixture(scope="module")
def csv_tricky_dir(spark, tmp_path_factory):
    # payloads chosen to stress CSV quoting: commas, embedded quotes,
    # leading/trailing spaces, and micro-precision timestamps
    d = str(tmp_path_factory.mktemp("csv_planted") / "csvsf")
    rows = [
        (1, D1 + timedelta(microseconds=123456), 7, "view", 1.25,
         '{"k": 1, "s": "a,b"}'),
        (2, D1 + timedelta(seconds=1, microseconds=999999), 8, "purchase",
         2.50, '{"k": 2, "s": "he said \\"hi\\""}'),
        (3, D1 + timedelta(seconds=2), 9, "error", 3.75,
         '{"k": 3, "s": " padded "}'),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_csv_roundtrip_integrity_planted(spark, csv_tricky_dir):
    import hashlib

    rows = QUERIES["csv_roundtrip_integrity"](spark, csv_tricky_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["rows_lost"] == 0 and r["rows_gained"] == 0
    assert r["n_rows"] == 3
    assert r["sum_v100"] == 125 + 250 + 375
    assert r["sum_user"] == 24
    # python replica of the row checksum over the PLANTED data — the
    # round-tripped checksum matching it proves byte fidelity through
    # CSV quoting and micro-precision timestamp formatting
    want = 0
    planted = [
        (1, D1 + timedelta(microseconds=123456), "view",
         '{"k": 1, "s": "a,b"}'),
        (2, D1 + timedelta(seconds=1, microseconds=999999), "purchase",
         '{"k": 2, "s": "he said \\"hi\\""}'),
        (3, D1 + timedelta(seconds=2), "error", '{"k": 3, "s": " padded "}'),
    ]
    for eid, ts, et, props in planted:
        key = f"{eid}|{et}|{ts.strftime('%Y-%m-%d %H:%M:%S.%f')}|{props}"
        want += int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    assert r["row_checksum"] == want


def test_jsonl_roundtrip_integrity_planted(spark, csv_tricky_dir):
    # same tricky corpus through the JSON-lines connector: the props
    # column is a JSON string INSIDE the JSON record, so embedded
    # quotes exercise nested escaping
    import hashlib

    rows = QUERIES["jsonl_roundtrip_integrity"](
        spark, csv_tricky_dir
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["rows_lost"] == 0 and r["rows_gained"] == 0
    assert (r["n_rows"], r["sum_v100"], r["sum_user"]) == (3, 750, 24)
    want = 0
    planted = [
        (1, D1 + timedelta(microseconds=123456), "view",
         '{"k": 1, "s": "a,b"}'),
        (2, D1 + timedelta(seconds=1, microseconds=999999), "purchase",
         '{"k": 2, "s": "he said \\"hi\\""}'),
        (3, D1 + timedelta(seconds=2), "error", '{"k": 3, "s": " padded "}'),
    ]
    for eid, ts, et, props in planted:
        key = f"{eid}|{et}|{ts.strftime('%Y-%m-%d %H:%M:%S.%f')}|{props}"
        want += int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    assert r["row_checksum"] == want


@pytest.fixture(scope="module")
def null_fields_dir(spark, tmp_path_factory):
    # ADVICE r06: concat_ws skips NULL fields while the oracle's ||
    # NULLs the whole key — a NULL event_type/props used to checksum
    # different row sets on the two engines. Plant actual NULLs.
    d = str(tmp_path_factory.mktemp("null_planted") / "nullsf")
    rows = [
        (1, D1 + timedelta(microseconds=123456), 7, "view", 1.25, '{"k": 1}'),
        (2, D1 + timedelta(seconds=1), 8, None, 2.50, '{"k": 2}'),
        (3, D1 + timedelta(seconds=2), 9, "error", 3.75, None),
        (4, D1 + timedelta(seconds=3), 10, None, 4.00, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize(
    "name", ["csv_roundtrip_integrity", "jsonl_roundtrip_integrity"]
)
def test_roundtrip_checksum_null_fields_cross_engine(
    spark, null_fields_dir, name
):
    """Both engines must checksum the SAME row set when key fields are
    NULL: the Spark side coalesces each component to the '<NULL>'
    sentinel before concat_ws, the oracle COALESCEs before ||, and a
    Python replica pins the expected value independently."""
    import hashlib

    import duckdb

    from dbt_project_spark.catalog import ORACLES

    r = QUERIES[name](spark, null_fields_dir).collect()[0]
    # NULLs survive both connectors (CSV reads empty-unquoted as NULL,
    # JSON omits null fields and schema-reads them back as NULL)...
    assert r["rows_lost"] == 0 and r["rows_gained"] == 0
    assert r["n_rows"] == 4
    # ...and every row contributes to the checksum — none drop out of
    # the SUM the way a NULL-propagating concat would make them.
    want = 0
    planted = [
        (1, D1 + timedelta(microseconds=123456), "view", '{"k": 1}'),
        (2, D1 + timedelta(seconds=1), None, '{"k": 2}'),
        (3, D1 + timedelta(seconds=2), "error", None),
        (4, D1 + timedelta(seconds=3), None, None),
    ]
    for eid, ts, et, props in planted:
        key = "|".join(
            [
                str(eid),
                et if et is not None else "<NULL>",
                ts.strftime("%Y-%m-%d %H:%M:%S.%f"),
                props if props is not None else "<NULL>",
            ]
        )
        want += int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    assert r["row_checksum"] == want
    # Cross-engine: the DuckDB oracle over the same parquet agrees.
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{null_fields_dir}/events.parquet/*.parquet')"
    )
    orow = con.execute(ORACLES[name]).fetchone()
    cols = [d[0] for d in con.description]
    oracle = dict(zip(cols, orow))
    assert oracle["row_checksum"] == want
    assert oracle["n_rows"] == 4


def _user_series():
    """Per-user event series from EVENTS in okey order: the okey is
    (ts-format, zero-padded event_id), and planted timestamps are
    unique per user, so plain (ts, event_id) ordering replicates it."""
    per = {}
    for eid, ts, u, _t, v, _p in EVENTS:
        per.setdefault(u, []).append((ts, eid, round(v * 100)))
    for series in per.values():
        series.sort()
    return per


def test_ts_ewma_dyadic_planted(spark, ev_dir):
    # replica of the 8-point dyadic kernel: weights 2^(7-k) over the
    # trailing lags, one final rounded division
    from decimal import ROUND_HALF_UP, Decimal

    want = {}
    for _u, series in _user_series().items():
        vals = [v for _, _, v in series]
        for i, (_, eid, _) in enumerate(series):
            num = den = 0
            for k in range(8):
                if i - k >= 0:
                    wgt = 2 ** (7 - k)
                    num += vals[i - k] * wgt
                    den += wgt
            ewma = Decimal(num) / (Decimal(den) * 100)
            want[eid] = float(ewma.quantize(Decimal("0.000001"),
                                            rounding=ROUND_HALF_UP))
    got = {r["event_id"]: r["ewma"] for r in
           QUERIES["ts_ewma_dyadic"](spark, ev_dir).collect()}
    assert got == want
    # multi-event users actually exercised the kernel depth
    assert any(len(s) > 1 for s in _user_series().values())


def test_ts_anomaly_sigma_planted(spark, ev_dir):
    # replica of the division-free rolling z-test: (x·n − Σx)² >
    # 4·(n·Σx² − (Σx)²) over the trailing-16 window excluding self,
    # flagged only with ≥8 points of history
    want = {}
    for _u, series in _user_series().items():
        vals = [v for _, _, v in series]
        for i, (_, eid, _) in enumerate(series):
            window = vals[max(0, i - 16):i]
            n = len(window)
            sx, sxx = sum(window), sum(x * x for x in window)
            x = vals[i]
            flag = n >= 8 and (x * n - sx) ** 2 > 4 * (n * sxx - sx * sx)
            want[eid] = (x, n, flag)
    got = {r["event_id"]: (r["value100"], r["n_window"], r["is_anomaly"])
           for r in QUERIES["ts_anomaly_sigma"](spark, ev_dir).collect()}
    assert got == want
    # no planted user has ≥8 prior events, so every flag is False —
    # the gate must be the history floor, not the z-test
    assert all(not f for _, _, f in want.values())


def test_ts_anomaly_sigma_flags_planted_spike(spark, tmp_path):
    # 12 steady-but-jittered readings then a spike: the z-test must
    # flag the spike and nothing else once history ≥ 8
    d = str(tmp_path / "spike")
    vals = [10.00, 10.02, 9.98, 10.01, 9.99, 10.03, 9.97, 10.02, 9.98,
            10.01, 9.99, 10.00, 25.00]
    rows = [
        (i, D1 + timedelta(minutes=i), 7, "view", v, '{"k": 1}')
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    got = {r["event_id"]: r["is_anomaly"] for r in
           QUERIES["ts_anomaly_sigma"](spark, d).collect()}
    v100 = [round(v * 100) for v in vals]
    want = {}
    for i in range(len(vals)):
        w = v100[max(0, i - 16):i]
        n, sx, sxx = len(w), sum(w), sum(x * x for x in w)
        want[i] = n >= 8 and (v100[i] * n - sx) ** 2 > 4 * (n * sxx - sx * sx)
    assert got == want
    assert got[12] is True  # the spike
    assert sum(got.values()) == 1  # and only the spike


def test_linreg_value_trend_planted(spark, ev_dir):
    # replica of the min-shifted exact-rational OLS slope per type
    pts = {}
    for _eid, ts, _u, t, v, _p in EVENTS:
        pts.setdefault(t, []).append((int(ts.timestamp()), round(v * 100)))
    want = {}
    for t, xy in pts.items():
        x0 = min(x for x, _ in xy)
        y0 = min(y for _, y in xy)
        xs = [x - x0 for x, _ in xy]
        ys = [y - y0 for _, y in xy]
        n = len(xy)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        want[t] = (n, str((n * sxy - sx * sy) * 86400),
                   str(n * sxx - sx * sx))
    got = {r["event_type"]: (r["n"], r["slope_day_num"], r["slope_day_den"])
           for r in QUERIES["linreg_value_trend"](spark, ev_dir).collect()}
    assert got == want
    # planted: purchase values rise with user id which rises with ts
    # on day 1 → strictly positive slope for the purchase cohort
    num, den = int(want["purchase"][1]), int(want["purchase"][2])
    assert num > 0 and den > 0


def test_chi2_type_weekday_planted(spark, ev_dir):
    # replica of the cleared-form chi-square with the x1e9 integer-sum
    # convention; planted events span 3 distinct weekdays
    cells = {}
    for _eid, ts, _u, t, _v, _p in EVENTS:
        dow = ts.isoweekday()
        cells[(t, dow)] = cells.get((t, dow), 0) + 1
    rows = sorted({t for t, _ in cells})
    cols = sorted({d for _, d in cells})
    rt = {t: sum(v for (a, _), v in cells.items() if a == t) for t in rows}
    ct = {d: sum(v for (_, b), v in cells.items() if b == d) for d in cols}
    nt = sum(cells.values())
    term9 = 0
    for (t, d), obs in cells.items():
        num = obs * nt - rt[t] * ct[d]
        term9 += round((num * 1.0 * num) / (1.0 * nt * rt[t] * ct[d])
                       * 1_000_000_000)
    want = (len(rows), len(cols), (len(rows) - 1) * (len(cols) - 1),
            round(term9 / 1_000_000_000.0, 6))
    out = QUERIES["chi2_type_weekday"](spark, ev_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_rows"], r["n_cols"], r["dof"], r["chi2"]) == want
    # purchase lives on day 1 and error on day 2 by construction →
    # strong dependence, chi2 far from zero
    assert r["chi2"] > 100.0


def test_equidepth_histogram_planted(spark, ev_dir):
    # replica of exact NTILE(10) over (v100, event_id): first
    # n mod 10 tiles get the extra row; bucket stats follow
    vals = sorted((round(v * 100), eid) for eid, _, _, _, v, _ in EVENTS)
    n = len(vals)
    base, extra = divmod(n, 10)
    want, pos = {}, 0
    for tile in range(1, 11):
        size = base + (1 if tile <= extra else 0)
        chunk = vals[pos:pos + size]
        pos += size
        want[tile] = (
            size,
            chunk[0][0] / 100.0,
            chunk[-1][0] / 100.0,
            sum(v for v, _ in chunk) / 100.0,
        )
    got = {r["tile"]: (r["n"], r["lo"], r["hi"], r["total"]) for r in
           QUERIES["equidepth_histogram"](spark, ev_dir).collect()}
    assert got == want
    # equi-DEPTH: bucket sizes differ by at most one
    sizes = [got[t][0] for t in range(1, 11)]
    assert max(sizes) - min(sizes) <= 1


def test_concurrent_sessions_timeline_planted(spark, ev_dir):
    # replica: 30-min-gap sessionization per user, per-session hour
    # interval, interval stabbing onto the hour grid
    sessions = []
    for _u, series in _user_series().items():
        eps = [int(ts.timestamp()) for ts, _, _ in series]
        start = eps[0]
        prev = eps[0]
        for ep in eps[1:]:
            if ep - prev > 1800:
                sessions.append((start, prev))
                start = ep
            prev = ep
        sessions.append((start, prev))
    lo = min(s // 3600 for s, _ in sessions)
    hi = max(e // 3600 for _, e in sessions)
    want = {}
    for h in range(lo, hi + 1):
        key = datetime.utcfromtimestamp(h * 3600).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        active = sum(1 for s, e in sessions if s // 3600 <= h <= e // 3600)
        started = sum(1 for s, _ in sessions if s // 3600 == h)
        want[key] = (active, started)
    got = {r["hour_start"]: (r["n_active_sessions"], r["n_started"])
           for r in QUERIES["concurrent_sessions_timeline"](
               spark, ev_dir).collect()}
    assert got == want
    # the day-1 purchase cohort arrives once a minute → one long
    # multi-hour session per user overlapping its whole span
    assert max(a for a, _ in want.values()) > 1


@pytest.fixture(scope="module")
def funnel_dir(spark, tmp_path_factory):
    # planted journeys discriminating the three funnel semantics
    # (same-session vs 24h-window vs unbounded):
    #   u1 view→click→purchase within minutes   (every funnel: full)
    #   u2 view→click, no purchase              (stage 2)
    #   u3 view only                            (stage 1)
    #   u4 click+purchase, NO view              (stage 0 / excluded)
    #   u5 view, click 2h later (same day)      (windowed: click ok;
    #       gap 7200 > 1800 splits the session  session: two partials)
    #   u6 view→purchase without click          (stage 1: order enforced)
    #   u7 view→click, purchase 35 min later    (windowed: full chain;
    #       gap 2100 splits the session         session: stage 2 max)
    d = str(tmp_path_factory.mktemp("funnel_planted") / "fnsf")
    rows = []
    eid = 0

    def add(u, etype, offset_s):
        nonlocal eid
        rows.append((eid, D1 + timedelta(seconds=offset_s), u, etype,
                     1.25, '{"k": 1}'))
        eid += 1

    add(1, "view", 0); add(1, "click", 60); add(1, "purchase", 120)
    add(2, "view", 0); add(2, "click", 90)
    add(3, "view", 0)
    add(4, "click", 0); add(4, "purchase", 60)
    add(5, "view", 0); add(5, "click", 7200)
    add(6, "view", 0); add(6, "purchase", 60)
    add(7, "view", 0); add(7, "click", 100); add(7, "purchase", 2200)
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_funnel_windowed_planted(spark, funnel_dir):
    got = {r["stage"]: (r["n_users"], r["pct_of_top"]) for r in
           QUERIES["funnel_windowed"](spark, funnel_dir).collect()}
    # viewers: u1,u2,u3,u5,u6,u7 = 6; in-window ordered clicks:
    # u1,u2,u5,u7 = 4; ordered purchases after the click: u1,u7 = 2
    assert got == {
        "1_view": (6, 100.0),
        "2_click": (4, round(4 * 10000 // 6 / 100.0, 2)),
        "3_purchase": (2, round(2 * 10000 // 6 / 100.0, 2)),
    }


def test_session_funnel_planted(spark, funnel_dir):
    got = {r["stage"]: r["n_sessions"] for r in
           QUERIES["session_funnel"](spark, funnel_dir).collect()}
    # sessions: u1 full(3); u2 view+click(2); u3 view(1);
    # u4 click+purchase no view(0); u5 view(1) + click-only(0);
    # u6 view+purchase-no-click(1); u7 view+click(2) + purchase-only(0)
    assert got == {3: 1, 2: 2, 1: 3, 0: 3}


def test_users_purchase_no_error_planted(spark, ev_dir):
    # replica of the (user, day) EXCEPT over the main events fixture
    p = {(u, ts.strftime("%Y-%m-%d")) for _, ts, u, t, _, _ in EVENTS
         if t == "purchase"}
    x = {(u, ts.strftime("%Y-%m-%d")) for _, ts, u, t, _, _ in EVENTS
         if t == "error"}
    want = p - x
    got = {(r["user_id"], r["day"]) for r in
           QUERIES["users_purchase_no_error"](spark, ev_dir).collect()}
    assert got == want
    # day-1 purchases never collide with day-2 errors, but user 201's
    # day-3 purchase shares its day with errors and must drop out
    assert all(d != "2024-01-03" or u in (202, 203)
               for u, d in got)


def test_cohort_retention_planted(spark, ev_dir):
    # replica: cohort = first active day; week_offset = floor days/7
    days = {}
    for _, ts, u, _, _, _ in EVENTS:
        ed = int(ts.timestamp()) // 86400
        days.setdefault(u, set()).add(ed)
    triples = set()
    for u, eds in days.items():
        c = min(eds)
        cday = datetime.utcfromtimestamp(c * 86400).strftime("%Y-%m-%d")
        for ed in eds:
            triples.add((cday, (ed - c) // 7, u))
    want = {}
    for cday, wk, _u in triples:
        want[(cday, wk)] = want.get((cday, wk), 0) + 1
    got = {(r["cohort_day"], r["week_offset"]): r["n_users"] for r in
           QUERIES["cohort_retention"](spark, ev_dir).collect()}
    assert got == want
    # the day-1 cohort is users 1..100 (DISTINCT users, week 0 —
    # users 51..100 being active on day 2 as well must not double
    # count); users 201..204 form their own day-3 cohort
    assert got[("2024-01-01", 0)] == 100
    assert got[("2024-01-03", 0)] == 4


def test_user_journey_path_planted(spark, funnel_dir):
    # journeys on the funnel fixture are fully scripted: ordered '>'
    # paths per (user, day)
    got = {(r["user_id"], str(r["day"])): (r["n_steps"], r["n_types"],
                                           r["path"]) for r in
           QUERIES["user_journey_path"](spark, funnel_dir).collect()}
    day = "2024-01-01"
    assert got[(1, day)] == (3, 3, "view>click>purchase")
    assert got[(2, day)] == (2, 2, "view>click")
    assert got[(3, day)] == (1, 1, "view")
    assert got[(4, day)] == (2, 2, "click>purchase")
    assert got[(6, day)] == (2, 2, "view>purchase")
    assert got[(7, day)] == (3, 3, "view>click>purchase")
    assert len(got) == 7


def test_session_window_stats_planted(spark, funnel_dir):
    # native session windows on scripted gaps: u5's 2h gap and u7's
    # 35-min gap split; window end = last event + 30 min
    got = {}
    for r in QUERIES["session_window_stats"](spark, funnel_dir).collect():
        got.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"], r["n_events"],
             r["total_value"]))
    for u in got:
        got[u].sort()

    def w(start_s, end_s, n):
        fmt = "%Y-%m-%d %H:%M:%S"
        return ((D1 + timedelta(seconds=start_s)).strftime(fmt),
                (D1 + timedelta(seconds=end_s + 1800)).strftime(fmt),
                n, n * 1.25)

    assert got[1] == [w(0, 120, 3)]
    assert got[2] == [w(0, 90, 2)]
    assert got[3] == [w(0, 0, 1)]
    assert got[4] == [w(0, 60, 2)]
    assert got[5] == [w(0, 0, 1), w(7200, 7200, 1)]
    assert got[6] == [w(0, 60, 2)]
    assert got[7] == [w(0, 100, 2), w(2200, 2200, 1)]


def test_robust_value_stats_planted(spark, ev_dir):
    # replica of the doubled-integer median/MAD trick + lowest-value
    # mode tiebreak over the main events fixture
    import statistics as st

    per = {}
    for _, _, _, t, v, _ in EVENTS:
        per.setdefault(t, []).append(round(v * 100))
    want = {}
    for t, vs in per.items():
        med2 = int(st.median([2 * v for v in vs]))
        mad4 = int(st.median([2 * abs(2 * v - med2) for v in vs]))
        counts = {}
        for v in vs:
            counts[v] = counts.get(v, 0) + 1
        mode = max(counts, key=lambda v: (counts[v] * 100000 - v))
        want[t] = (round(med2 / 200.0, 6), round(mad4 / 400.0, 6),
                   round(mode / 100.0, 6), len(vs))
    got = {r["event_type"]: (r["median_value"], r["mad_value"],
                             r["mode_value"], r["n"]) for r in
           QUERIES["robust_value_stats"](spark, ev_dir).collect()}
    assert got == want
    # all planted values are distinct per type → mode ties break to
    # the LOWEST value
    assert got["purchase"][2] == 1.25


def test_skew_key_histogram_planted(spark, orders_dir):
    # the CDC orders fixture: custkey 5 owns all 6 orders → a single
    # key in the bit-length-of-6 bucket (110b → bucket 3)
    rows = QUERIES["skew_key_histogram"](spark, orders_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["bucket"] == 3  # len(bin(6)) = len('110')
    assert r["n_keys"] == 1 and r["n_rows"] == 6 and r["max_cnt"] == 6
    assert r["rows_share"] == 1.0
