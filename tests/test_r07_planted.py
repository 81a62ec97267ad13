"""Planted replica tests for the 12 algorithmic names VERDICT r06
still found on ORACLE_GATE_ONLY (burn-down task 6): drift PSI,
watermark lateness, SRM, NDR cohorts, table profiling, VARIANT
round-trip, percent-of-parent, the two gated sketches, the corpus
funnel/stats pair, and the NB margin calibration. Every expectation is
recomputed in plain Python (hashlib / math) from the planted rows —
never by restating the oracle SQL.
"""

import calendar
import hashlib
import math
import os
from datetime import datetime, timedelta

import pytest

from dbt_project_spark.catalog import QUERIES, load_all

load_all()

D1 = datetime(2024, 1, 1)


def _utc_epoch(dt: datetime) -> int:
    return calendar.timegm(dt.utctimetuple())


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _round_half_up(x: float) -> int:
    # Spark F.round / DuckDB round: half away from zero on doubles.
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _pctile(sorted_vals, q):
    # Spark `percentile` / DuckDB quantile_cont: linear interpolation.
    n = len(sorted_vals)
    pos = (n - 1) * q
    lo = int(math.floor(pos))
    hi = min(lo + 1, n - 1)
    frac = pos - lo
    return sorted_vals[lo] + frac * (sorted_vals[hi] - sorted_vals[lo])


_EVSCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path_factory, name, rows):
    d = str(tmp_path_factory.mktemp(name) / "sf")
    spark.createDataFrame(rows, _EVSCHEMA).coalesce(1).write.parquet(
        os.path.join(d, "events.parquet")
    )
    return d


# ---------------------------------------------------------------------------
# drift_psi_value
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def psi_dir(spark, tmp_path_factory):
    # 'view' events: ref half buckets {0:4, 1:4, 2:2} (ref_t=10),
    # cur half {0:2, 1:6} (cur_t=8). Bucket 2 has cur_n=0 so it is
    # excluded from the PSI terms but still counts in ref_t — the
    # 'ignore empty buckets but keep totals' form the query documents.
    rows, eid = [], 0
    # value -> bucket (v100 div 5000): 10.0->0, 60.0->1, 110.0->2
    ref = [10.0] * 4 + [60.0] * 4 + [110.0] * 2
    cur = [10.0] * 2 + [60.0] * 6
    for v in ref:
        rows.append((eid, D1 + timedelta(minutes=eid), 1, "view", v, "{}"))
        eid += 1
    for v in cur:
        rows.append(
            (eid, D1 + timedelta(hours=10, minutes=eid), 1, "view", v, "{}")
        )
        eid += 1
    return _write_events(spark, tmp_path_factory, "psi_planted", rows)


def test_drift_psi_value_planted(spark, psi_dir):
    rows = QUERIES["drift_psi_value"](spark, psi_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["event_type"] == "view"
    assert r["n_buckets"] == 2  # bucket 2 (ref-only) excluded
    term9 = 0
    for p, q in [(4 / 10, 2 / 8), (4 / 10, 6 / 8)]:
        term9 += _round_half_up((p - q) * math.log(p / q) * 1e9)
    assert r["psi"] == round(term9 / 1e9, 6)


# ---------------------------------------------------------------------------
# watermark_lateness_stats
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lateness_dir(spark, tmp_path_factory):
    # One user; event_id is arrival order, ts is event time.
    # eps: 100, 200, 150, 300, 120, 300 → lateness 0,0,50,0,180,0
    eps = [100, 200, 150, 300, 120, 300]
    rows = [
        (i + 1, datetime(2024, 1, 1) + timedelta(seconds=ep), 7, "view",
         1.0, "{}")
        for i, ep in enumerate(eps)
    ]
    return _write_events(spark, tmp_path_factory, "late_planted", rows)


def test_watermark_lateness_stats_planted(spark, lateness_dir):
    r = QUERIES["watermark_lateness_stats"](spark, lateness_dir).collect()[0]
    assert r["n_events"] == 6
    assert r["n_late"] == 2
    assert r["late_frac"] == round(2 / 6, 6)
    assert r["max_late_s"] == 180
    late20 = sorted([0, 0, 0, 0, 20 * 50, 20 * 180])
    assert r["p95_late_s_x20"] == _round_half_up(_pctile(late20, 0.95))


# ---------------------------------------------------------------------------
# ab_srm_check
# ---------------------------------------------------------------------------


def test_ab_srm_check_planted(spark, tmp_path_factory):
    users = list(range(1, 41))
    rows = [
        (u, D1 + timedelta(minutes=u), u, "view", 1.0, "{}") for u in users
    ] + [  # duplicate events must not double-count users
        (100 + u, D1 + timedelta(hours=2, minutes=u), u, "purchase", 2.0,
         "{}")
        for u in users[:10]
    ]
    d = _write_events(spark, tmp_path_factory, "srm_planted", rows)
    r = QUERIES["ab_srm_check"](spark, d).collect()[0]
    n_a = sum(1 for u in users if _md5_int(str(u)) % 2 == 0)
    n_b = len(users) - n_a
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    assert r["chi2"] == round((n_a - n_b) ** 2 / (n_a + n_b), 6)
    assert r["srm_detected"] == (
        1 if 1000 * (n_a - n_b) ** 2 > 3841 * (n_a + n_b) else 0
    )


# ---------------------------------------------------------------------------
# cohort_revenue_retention
# ---------------------------------------------------------------------------


def test_cohort_revenue_retention_planted(spark, tmp_path_factory):
    # 30-day epoch months. Cohort m: users 1,2 start in em0 with
    # revenue 30.00; user 1 returns in em0+1 spending 4.50; user 3
    # starts in em0+1 (its own cohort) spending 8.00.
    # exact em values are irrelevant: the replica recomputes them
    # from the planted timestamps with the same floor division
    em0_ts = datetime(2024, 1, 1)
    rows = [
        (1, em0_ts, 1, "purchase", 10.00, "{}"),
        (2, em0_ts + timedelta(hours=1), 2, "purchase", 20.00, "{}"),
        (3, em0_ts + timedelta(days=31), 1, "purchase", 4.50, "{}"),
        (4, em0_ts + timedelta(days=32), 3, "purchase", 8.00, "{}"),
    ]
    d = _write_events(spark, tmp_path_factory, "ndr_planted", rows)
    got = {
        (r["cohort_m"], r["offset_m"]): (r["revenue"], r["ndr"])
        for r in QUERIES["cohort_revenue_retention"](spark, d).collect()
    }
    # python replica
    ev = [(uid, _utc_epoch(ts) // 2592000, int(round(v * 100)))
          for (_e, ts, uid, _t, v, _p) in rows]
    cohort = {}
    for uid, em, _v in ev:
        cohort[uid] = min(cohort.get(uid, em), em)
    cell = {}
    for uid, em, v100 in ev:
        key = (cohort[uid], em - cohort[uid])
        cell[key] = cell.get(key, 0) + v100
    want = {}
    for (cm, off), rev100 in cell.items():
        base100 = cell[(cm, 0)]
        want[(cm, off)] = (rev100 / 100.0, round(rev100 / base100, 6))
    assert got == want
    assert len(want) == 3  # two cohorts, one with an offset-1 row


# ---------------------------------------------------------------------------
# profile_table
# ---------------------------------------------------------------------------


def test_profile_table_planted(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("profile_planted") / "sf")
    li = [
        # (okey, partkey, suppkey, linenumber, qty, extprice, disc, tax,
        #  rflag, lstatus, shipdate)
        (1, 1, 1, 1, 1.0, 100.50, 0.0, 0.0, "A", "O", datetime(2024, 1, 5)),
        (1, 2, 1, 7, 2.0, 200.25, 0.0, 0.0, "N", "O", datetime(2024, 2, 5)),
        (2, 3, 2, 3, 2.0, 300.00, 0.0, 0.0, "R", "F", datetime(2024, 2, 9)),
        (3, 4, 2, 14, 9.5, 400.75, 0.0, 0.0, "A", "F", datetime(2024, 3, 1)),
    ]
    spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))
    got = {
        r["col_name"]: (
            r["n_rows"], r["n_null"], r["n_distinct"],
            r["min_value"], r["max_value"],
        )
        for r in QUERIES["profile_table"](spark, d).collect()
    }
    # replica over the derived profile columns
    okey = [1, 1, 2, 3]
    qty100 = [100, 200, 200, 950]
    ep100 = [10050, 20025, 30000, 40075]
    rflag = ["A", "N", "R", "A"]
    ship_ym = ["2024-01", "2024-02", "2024-02", "2024-03"]
    qty_sparse = [100, None, 200, None]  # linenumber % 7 == 0 → NULL
    cols = {
        "okey": okey, "qty100": qty100, "ep100": ep100, "rflag": rflag,
        "ship_ym": ship_ym, "qty_sparse": qty_sparse,
    }
    for name, vals in cols.items():
        nn = [v for v in vals if v is not None]
        want = (
            4, 4 - len(nn), len(set(nn)), str(min(nn)), str(max(nn))
        )
        assert got[name] == want, (name, got[name], want)


# ---------------------------------------------------------------------------
# user_profile_variant
# ---------------------------------------------------------------------------


def test_user_profile_variant_planted(spark, tmp_path_factory):
    rows = [
        (1, D1, 1, "view", 1.0, "{}"),
        (2, D1 + timedelta(minutes=1), 1, "view", 1.0, "{}"),
        (3, D1 + timedelta(minutes=2), 1, "purchase", 1.0, "{}"),
        (4, D1 + timedelta(minutes=3), 2, "error", 1.0, "{}"),
        (5, D1 + timedelta(minutes=4), 2, "click", 1.0, "{}"),
        (6, D1 + timedelta(minutes=5), 2, "click", 1.0, "{}"),
        (7, D1 + timedelta(minutes=6), 3, "view", 1.0, "{}"),
    ]
    d = _write_events(spark, tmp_path_factory, "variant_planted", rows)
    got = {
        r["user_id"]: (r["n_types"], r["first_type"], r["first_n"])
        for r in QUERIES["user_profile_variant"](spark, d).collect()
    }
    # the VARIANT round trip must surface: #distinct types, the
    # lexicographically first type (array_sort on struct(t, n)), and
    # that type's count
    assert got == {
        1: (2, "purchase", 1),
        2: (2, "click", 2),
        3: (1, "view", 1),
    }


# ---------------------------------------------------------------------------
# pct_of_parent_revenue
# ---------------------------------------------------------------------------


def test_pct_of_parent_revenue_planted(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pctparent_planted") / "sf")
    spark.createDataFrame(
        [(0, "AMERICA"), (1, "ASIA")], "r_regionkey int, r_name string"
    ).coalesce(1).write.parquet(os.path.join(d, "region.parquet"))
    spark.createDataFrame(
        [(0, "BRAZIL", 0), (1, "CANADA", 0), (2, "JAPAN", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.parquet(os.path.join(d, "nation.parquet"))
    spark.createDataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 1, 0.0), (3, "s3", 2, 0.0)],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.parquet(os.path.join(d, "supplier.parquet"))
    li = [
        (1, 1, 1, 1, 1.0, 100.00, 0.0, 0.0, "N", "O", datetime(2024, 1, 5)),
        (2, 2, 1, 1, 1.0, 200.00, 0.0, 0.0, "N", "O", datetime(2024, 1, 6)),
        (3, 3, 2, 1, 1.0, 300.00, 0.0, 0.0, "N", "O", datetime(2024, 1, 7)),
        (4, 4, 3, 1, 1.0, 400.00, 0.0, 0.0, "N", "O", datetime(2024, 1, 8)),
    ]
    spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))
    got = {
        r["nation"]: (
            r["region"], r["revenue"], r["pct_of_region"], r["pct_of_total"]
        )
        for r in QUERIES["pct_of_parent_revenue"](spark, d).collect()
    }
    # BRAZIL 300 of AMERICA's 600; CANADA 300/600; JAPAN 400/400.
    assert got == {
        "BRAZIL": ("AMERICA", 300.0, round(30000 / 60000, 6),
                   round(30000 / 100000, 6)),
        "CANADA": ("AMERICA", 300.0, round(30000 / 60000, 6),
                   round(30000 / 100000, 6)),
        "JAPAN": ("ASIA", 400.0, 1.0, round(40000 / 100000, 6)),
    }


# ---------------------------------------------------------------------------
# approx_distinct_users_daily / approx_percentiles_by_type
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sketch_dir(spark, tmp_path_factory):
    rows, eid = [], 0
    for u in range(1, 61):  # day 1: users 1..60, one duplicate visit
        rows.append((eid, D1 + timedelta(minutes=u), u, "view",
                     float(u), "{}"))
        eid += 1
    rows.append((eid, D1 + timedelta(hours=20), 1, "view", 7.0, "{}"))
    eid += 1
    for u in range(41, 71):  # day 2: users 41..70
        rows.append((eid, D1 + timedelta(days=1, minutes=u), u, "purchase",
                     float(u) + 0.5, "{}"))
        eid += 1
    return _write_events(spark, tmp_path_factory, "sketch_planted", rows)


def test_approx_distinct_users_daily_planted(spark, sketch_dir):
    got = {
        r["day"]: (r["n_users_exact"], r["hll_within_5pct"])
        for r in QUERIES["approx_distinct_users_daily"](
            spark, sketch_dir
        ).collect()
    }
    assert got == {"2024-01-01": (60, True), "2024-01-02": (30, True)}


def test_approx_percentiles_by_type_planted(spark, sketch_dir):
    got = {
        r["event_type"]: (r["p50"], r["p90"], r["sketch_within_rank_tol"])
        for r in QUERIES["approx_percentiles_by_type"](
            spark, sketch_dir
        ).collect()
    }
    view = sorted([u * 100 for u in range(1, 61)] + [700])
    pur = sorted([u * 100 + 50 for u in range(41, 71)])
    for t, vals in [("view", view), ("purchase", pur)]:
        assert got[t][0] == round(_pctile(vals, 0.5) / 100.0, 6)
        assert got[t][1] == round(_pctile(vals, 0.9) / 100.0, 6)
        assert got[t][2] is True


# ---------------------------------------------------------------------------
# corpus_filter_funnel / corpus_token_stats
# ---------------------------------------------------------------------------

_DOCSCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _write_docs(spark, tmp_path_factory, name, rows):
    d = str(tmp_path_factory.mktemp(name) / "sf")
    spark.createDataFrame(rows, _DOCSCHEMA).coalesce(1).write.parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_corpus_filter_funnel_planted(spark, tmp_path_factory):
    short = "tiny doc"  # 2 tokens → fails length gate
    stoppy = " ".join(["the"] * 25)  # all stopwords → fails quality
    good = " ".join(
        ["alpha", "beta", "gamma", "delta", "epsilon"] * 5
    )  # 25 toks, 5 unique (0.2 < ratio? 5/25 = 0.2 → NOT > 0.2) —
    # add a sixth unique token to clear the threshold
    good = good + " zeta"  # 26 tokens, 6 unique → 0.2308 > 0.2
    unique_doc = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (1, short, "en", "web", len(short)),
        (2, stoppy, "en", "web", len(stoppy)),
        (3, good, "en", "web", len(good)),
        (4, good, "en", "books", len(good)),  # exact dup of 3
        (5, unique_doc, "en", "web", len(unique_doc)),
    ]
    d = _write_docs(spark, tmp_path_factory, "funnel_planted", rows)
    got = {
        r["stage"]: (r["n_in"], r["n_dropped"], r["n_out"])
        for r in QUERIES["corpus_filter_funnel"](spark, d).collect()
    }
    assert got == {
        "token_length": (5, 1, 4),
        "quality": (4, 1, 3),
        "exact_dedup": (3, 1, 2),
    }


def test_corpus_token_stats_planted(spark, tmp_path_factory):
    rows = [
        (1, "Alpha beta beta", "en", "web", 15),
        (2, "alpha GAMMA", "en", "web", 11),
        (3, "un deux trois deux", "fr", "books", 18),
    ]
    d = _write_docs(spark, tmp_path_factory, "tokstats_planted", rows)
    got = {
        (r["lang"], r["source"]): (
            r["n_docs"], r["total_tokens"], r["vocab"], r["avg_tokens"]
        )
        for r in QUERIES["corpus_token_stats"](spark, d).collect()
    }
    # tokenizer is lower + [a-z0-9]+ runs
    assert got == {
        ("en", "web"): (2, 5, 3, 2.5),   # alpha beta beta | alpha gamma
        ("fr", "books"): (1, 4, 3, 4.0),  # un deux trois deux
    }


# ---------------------------------------------------------------------------
# merge_upsert_orders — MERGE lifecycle replica over planted orders
# ---------------------------------------------------------------------------


def test_merge_upsert_orders_planted(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("merge_planted") / "sf")
    # months: Jan (untouched by the batch window), Apr/May (update
    # overlap), Aug/Sep (inserts). Keys 29 and 13 trigger the CDC
    # transforms; key 26 (2×13) gets the price bump as an UPDATE.
    rows = [
        # (okey, custkey, status, totalprice, orderdate, priority)
        (1, 1, "F", 100.00, datetime(1997, 1, 10), "1-URGENT"),
        (2, 1, "F", 150.00, datetime(1997, 1, 20), "1-URGENT"),
        (26, 2, "O", 200.00, datetime(1997, 4, 5), "2-HIGH"),
        (29, 2, "O", 300.00, datetime(1997, 5, 6), "2-HIGH"),
        (31, 3, "O", 400.00, datetime(1997, 6, 7), "3-MEDIUM"),
        (40, 3, "O", 500.00, datetime(1997, 8, 8), "3-MEDIUM"),
        (52, 4, "O", 600.00, datetime(1997, 9, 9), "3-MEDIUM"),
        (99, 4, "O", 700.00, datetime(1998, 6, 1), "4-LOW"),  # outside
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))
    r = QUERIES["merge_upsert_orders"](spark, d).collect()[0]
    # python replica of the merged state
    base = {}  # order_id -> (status, price100, ym)
    batch = {}
    for okey, _c, st, price, od, _p in rows:
        p100 = int(round(price * 100))
        ym = f"{od.year:04d}-{od.month:02d}"
        if od < datetime(1997, 7, 1):
            base[okey] = (st, p100, ym)
        if datetime(1997, 4, 1) <= od < datetime(1998, 1, 1):
            st2 = "P" if okey % 29 == 0 else st
            p2 = (p100 * 11) // 10 if okey % 13 == 0 else p100
            batch[okey] = (st2, p2, ym)
    # MERGE: batch wins on key collision; every other base row
    # survives (keys never move partitions here, so the partition-
    # scoped anti-join equals the global one).
    merged = dict(batch)
    for k, v in base.items():
        merged.setdefault(k, v)
    assert r["n_rows"] == len(merged) == 7  # 99 is outside both windows
    # Jan (untouched) + Apr/May/Jun (update overlap) + Aug/Sep (inserts)
    assert r["n_partitions"] == len({v[2] for v in merged.values()}) == 6
    assert r["sum_price100"] == sum(v[1] for v in merged.values())
    want_ck = sum(
        _md5_int(f"{k}|{v[0]}|{v[1]}") for k, v in merged.items()
    )
    assert r["row_checksum"] == want_ck
    # updates: keys 26, 29, 31 pre-exist; inserts: 40, 52
    assert (r["n_updated"], r["n_inserted"]) == (3, 2)
    # the CDC transforms actually landed in the merged state
    assert merged[29][0] == "P" and merged[26][1] == 22000


# ---------------------------------------------------------------------------
# incremental_daily_rollup — high-water-mark lifecycle replica
# ---------------------------------------------------------------------------


def test_incremental_daily_rollup_planted(spark, tmp_path_factory):
    # Two days at/below the 2024-01-20 high-water mark, two past it.
    # The query's run-2 source doubles the old days' values — a
    # correct incremental run must keep the ORIGINAL old-day sums.
    rows = [
        (1, datetime(2024, 1, 5, 10), 1, "view", 1.00, "{}"),
        (2, datetime(2024, 1, 5, 11), 2, "view", 2.00, "{}"),
        (3, datetime(2024, 1, 20, 12), 1, "purchase", 3.50, "{}"),
        (4, datetime(2024, 1, 25, 13), 2, "view", 4.00, "{}"),
        (5, datetime(2024, 1, 25, 14), 1, "error", 5.25, "{}"),
        (6, datetime(2024, 1, 30, 15), 3, "view", 6.00, "{}"),
    ]
    d = _write_events(spark, tmp_path_factory, "inc_planted", rows)
    got = {
        (r["day"], r["event_type"]): (r["n_events"], r["sum_v100"])
        for r in QUERIES["incremental_daily_rollup"](spark, d).collect()
    }
    want = {}
    for _e, ts, _u, et, v, _p in rows:
        key = (ts.strftime("%Y-%m-%d"), et)
        n, s = want.get(key, (0, 0))
        want[key] = (n + 1, s + int(round(v * 100)))
    assert got == want
    # the tamper really targeted the old days (sanity on the fixture)
    assert want[("2024-01-05", "view")] == (2, 300)
    assert want[("2024-01-25", "view")] == (1, 400)


# ---------------------------------------------------------------------------
# nb_margin_calibration — full python replica of the NB model + margins
# ---------------------------------------------------------------------------


def _nb_replica(docs):
    """docs: list of (doc_id, lang, text). Returns the expected
    (bin → (n_docs, n_correct, accuracy_micro, min_margin9,
    max_margin9)) map, replicating the hashed-bucket NB + margin
    quintile dataflow in plain python."""
    import re as _re

    NB_B, NB_TEST_MOD, BINS = 256, 5, 5
    bt = []  # (doc_id, lang, bucket) per token OCCURRENCE
    for did, lang, text in docs:
        for w in _re.findall(r"[a-z0-9]+", text.lower()):
            bt.append((did, lang, _md5_int(w) % NB_B))
    train = [r for r in bt if r[0] % NB_TEST_MOD != 0]
    test = [r for r in bt if r[0] % NB_TEST_MOD == 0]
    langs = sorted({lang for _d, lang, _t in docs})
    rk = {c: i + 1 for i, c in enumerate(langs)}
    ncls = len(langs)
    cnt, tot = {}, {}
    for _d, c, b in train:
        cnt[(c, b)] = cnt.get((c, b), 0) + 1
        tot[c] = tot.get(c, 0) + 1
    train_docs = {d for d, _c, _b in train}
    nd = {}
    for d in train_docs:
        c = next(lang for did, lang, _t in docs if did == d)
        nd[c] = nd.get(c, 0) + 1
    p9 = {
        c: _round_half_up(math.log(nd[c] / len(train_docs)) * 1e9)
        for c in langs
    }
    buckets = sorted({b for _d, _c, b in bt})
    lam9 = {
        (c, b): _round_half_up(
            math.log((cnt.get((c, b), 0) + 1) / (tot[c] + NB_B)) * 1e9
        )
        for c in langs
        for b in buckets
    }
    # per test doc: score per class, top-2 by integer key
    test_docs = sorted({d for d, _c, _b in test})
    margins = []  # (margin9, doc_id, correct)
    for d in test_docs:
        toks = [b for did, _c, b in test if did == d]
        true_lang = next(lang for did, lang, _t in docs if did == d)
        scored = []
        for c in langs:
            s9 = sum(lam9[(c, b)] for b in toks)
            sc = s9 + p9[c]
            scored.append((sc * 8 + (ncls - rk[c]), sc, c))
        scored.sort(key=lambda t: -t[0])
        margins.append(
            (scored[0][1] - scored[1][1], d, scored[0][2] == true_lang)
        )
    margins.sort(key=lambda t: (t[0], t[1]))
    n = len(margins)
    want = {}
    sizes = [n // BINS + (1 if i < n % BINS else 0) for i in range(BINS)]
    pos = 0
    for i, size in enumerate(sizes):
        if size == 0:
            continue
        chunk = margins[pos:pos + size]
        pos += size
        ncorr = sum(1 for _m, _d, ok in chunk if ok)
        want[i + 1] = (
            size,
            ncorr,
            ncorr * 1_000_000 // size,
            min(m for m, _d, _ok in chunk),
            max(m for m, _d, _ok in chunk),
        )
    return want


def test_nb_margin_calibration_planted(spark, tmp_path_factory):
    # 30 docs, 2 langs, lang-distinctive vocab plus shared noise so
    # margins vary; doc_id % 5 == 0 → 6 test docs → quintile sizes
    # [2, 1, 1, 1, 1].
    docs = []
    for i in range(30):
        lang = "en" if i < 15 else "fr"
        words = []
        for j in range(8 + (i % 5)):
            words.append(f"{lang}word{(i + j) % 7}")
        words.append(f"shared{i % 3}")
        docs.append((i, lang, " ".join(words)))
    rows = [(did, text, lang, "web", len(text)) for did, lang, text in docs]
    d = _write_docs(spark, tmp_path_factory, "nbcal_planted", rows)
    got = {
        r["bin"]: (
            r["n_docs"], r["n_correct"], r["accuracy_micro"],
            r["min_margin9"], r["max_margin9"],
        )
        for r in QUERIES["nb_margin_calibration"](spark, d).collect()
    }
    assert got == _nb_replica(docs)
