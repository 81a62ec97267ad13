"""Planted-semantics tests for the statistics family: tiny synthetic
events tables where each statistic has a KNOWN closed-form answer
(uniform → zero Gini, single-type day → zero entropy, step series →
CUSUM at the step, alternating series → negative lag-1 ACF...). These
pin the MEANING of each statistic; the oracle gate only pins
cross-engine agreement."""

import math

import pytest

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_epoch_s, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [
            (int(e), float(ts), int(u), t, float(v), "{}")
            for e, ts, u, t, v in rows
        ],
        "event_id bigint, __ep double, user_id bigint, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("__ep")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


DAY = 86400
T0 = 1_700_000_000 - (1_700_000_000 % DAY)  # midnight anchor


def test_gini_uniform_is_zero_and_concentrated_is_high(spark, tmp_path):
    from dbt_project_spark.queries_quality import gini_user_value

    # 10 users, each spends exactly 100 → Gini 0
    rows = [(i, T0 + i, i % 10, "view", 100.0) for i in range(10)]
    sf = _write_events(spark, tmp_path / "u", rows)
    assert gini_user_value(spark, sf).collect()[0]["gini"] == 0.0

    # one whale holds everything except epsilon shares
    rows = [(0, T0, 0, "view", 10000.0)] + [
        (i, T0 + i, i, "view", 0.01) for i in range(1, 10)
    ]
    sf = _write_events(spark, tmp_path / "w", rows)
    g = gini_user_value(spark, sf).collect()[0]["gini"]
    assert g > 0.85  # → (n-1)/n = 0.9 as epsilon → 0


def test_entropy_single_type_zero_uniform_lnk(spark, tmp_path):
    from dbt_project_spark.queries_quality import entropy_type_daily

    # day 1: all 'view' → entropy 0; day 2: 4 types × equal → ln 4
    rows = [(i, T0 + i, 1, "view", 1.0) for i in range(8)]
    rows += [
        (100 + i, T0 + DAY + i, 1, t, 1.0)
        for i, t in enumerate(
            ["view", "click", "purchase", "error"] * 2
        )
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["day"]: r for r in entropy_type_daily(spark, sf).collect()}
    days = sorted(got)
    assert got[days[0]]["entropy_nats"] == 0.0
    assert abs(got[days[1]]["entropy_nats"] - math.log(4)) < 1e-6
    assert got[days[1]]["n_types"] == 4


def test_cusum_finds_planted_step(spark, tmp_path):
    from dbt_project_spark.queries_timeseries import ts_cusum_changepoint

    # 10 days at $100/day then 10 days at $200/day → cp at day 10
    rows = [(i, T0 + i * DAY + 10, 1, "view", 100.0) for i in range(10)]
    rows += [
        (100 + i, T0 + (10 + i) * DAY + 10, 1, "view", 200.0)
        for i in range(10)
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = ts_cusum_changepoint(spark, sf).collect()[0]
    assert row["n_days"] == 20
    assert row["mean_before"] == 100.0 and row["mean_after"] == 200.0
    import datetime as dt

    cp = dt.datetime.strptime(row["cp_day"], "%Y-%m-%d")
    lo = dt.datetime.utcfromtimestamp(T0)
    assert (cp - lo).days == 9  # last day of the low regime


def test_acf_alternating_series_signs(spark, tmp_path):
    from dbt_project_spark.queries_timeseries import ts_acf_hourly

    # hourly values alternating 100/300 → lag-1 ACF ≈ -1, lag-2 ≈ +1
    rows = [
        (i, T0 + i * 3600 + 5, 1, "view", 100.0 if i % 2 == 0 else 300.0)
        for i in range(48)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["lag"]: r["acf_micro"] / 1e6 for r in ts_acf_hourly(spark, sf).collect()}
    assert got[1] < -0.9 and got[3] < -0.9
    assert got[2] > 0.9 and got[4] > 0.9


def test_ks_identical_halves_zero_shifted_high(spark, tmp_path):
    from dbt_project_spark.queries_quality import ks_test_value

    # halves drawn identically → D = 0
    vals = [10.0, 20.0, 30.0, 40.0] * 5
    rows = [(i, T0 + i, 1, "view", v) for i, v in enumerate(vals)]
    rows += [
        (100 + i, T0 + DAY + i, 1, "view", v) for i, v in enumerate(vals)
    ]
    sf = _write_events(spark, tmp_path / "same", rows)
    r = ks_test_value(spark, sf).collect()[0]
    assert r["ks_d"] == 0.0

    # disjoint supports → D = 1
    rows = [(i, T0 + i, 1, "view", 10.0) for i in range(20)]
    rows += [(100 + i, T0 + DAY + i, 1, "view", 99.0) for i in range(20)]
    sf = _write_events(spark, tmp_path / "disj", rows)
    r = ks_test_value(spark, sf).collect()[0]
    assert r["ks_d"] == 1.0


def test_mannwhitney_no_shift_half_effect(spark, tmp_path):
    from dbt_project_spark.queries_quality import mannwhitney_value

    # identical halves → U = n1*n2/2 → common-language effect 0.5
    vals = [10.0, 20.0, 30.0, 40.0, 50.0] * 4
    rows = [(i, T0 + i, 1, "view", v) for i, v in enumerate(vals)]
    rows += [
        (100 + i, T0 + DAY + i, 1, "view", v) for i, v in enumerate(vals)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = mannwhitney_value(spark, sf).collect()[0]
    assert r["cl_effect"] == 0.5
    # every cur value above every ref value → effect 0 (ref loses)
    rows = [(i, T0 + i, 1, "view", 10.0) for i in range(10)]
    rows += [(100 + i, T0 + DAY + i, 1, "view", 99.0) for i in range(10)]
    sf2 = _write_events(spark, tmp_path / "shift", rows)
    r = mannwhitney_value(spark, sf2).collect()[0]
    assert r["cl_effect"] == 0.0


def test_winsorized_clips_outlier(spark, tmp_path):
    from dbt_project_spark.queries_quality import winsorized_stats

    # 19 values of 100 and one 10000: trimmed mean stays at 100,
    # the plain mean would be 595
    rows = [(i, T0 + i, 1, "view", 100.0) for i in range(19)]
    rows.append((99, T0 + 99, 1, "view", 10000.0))
    sf = _write_events(spark, tmp_path, rows)
    r = winsorized_stats(spark, sf).collect()[0]
    assert r["trimmed_mean"] == 100.0
    assert r["winsorized_mean"] < 130.0  # clipped at p95, far below 595
    assert r["n_kept"] == 19


def test_rolling_distinct_windows(spark, tmp_path):
    from dbt_project_spark.queries_analytics import rolling_distinct_users_7d

    # user u active only on day u (u = 0..9): day d sees users
    # max(0, d-6)..d → counts ramp 1..7 then stay 7
    rows = [(u, T0 + u * DAY + 30, u, "view", 1.0) for u in range(10)]
    sf = _write_events(spark, tmp_path, rows)
    rows_out = sorted(
        rolling_distinct_users_7d(spark, sf).collect(),
        key=lambda r: r["day"],
    )
    counts = [r["n_users_7d"] for r in rows_out]
    assert counts == [1, 2, 3, 4, 5, 6, 7, 7, 7, 7]
    assert all(r["n_users_1d"] == 1 for r in rows_out)


def test_time_travel_planted_log(spark, tmp_path):
    """Planted CDC semantics: 4 orders — one plain, one updated before
    the cutoff, one deleted before the cutoff, one inserted after it.
    AS OF must show: plain at original price, updated at +$100,
    deleted absent, future absent."""
    from dbt_project_spark.queries_temporal import (
        TT_CUTOFF,
        TT_DEL_MOD,
        TT_UPD_MOD,
        time_travel_asof,
    )

    import datetime as dt

    cutoff = dt.datetime.strptime(TT_CUTOFF, "%Y-%m-%d")
    before = cutoff - dt.timedelta(days=40)
    after = cutoff + dt.timedelta(days=5)
    # keys chosen by residue: 1 plain, TT_UPD_MOD updated,
    # TT_DEL_MOD deleted, 1 plain-but-future
    rows = [
        (1, 17, "O", 100.0, before, "P1"),
        (TT_UPD_MOD, 17, "O", 100.0, before, "P1"),
        (TT_DEL_MOD, 17, "O", 100.0, before, "P1"),
        (2, 17, "O", 100.0, after, "P1"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    got = time_travel_asof(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    # visible: key 1 ($100) + updated key ($200); deleted and future absent
    assert r["o_orderstatus"] == "O"
    assert r["n_orders"] == 2
    assert r["total_price"] == 300.0


def test_mann_kendall_monotone_and_flat(spark, tmp_path):
    """Strictly increasing daily series: S = n(n-1)/2, Sen slope =
    the planted step. Constant series: S = 0, full tie correction."""
    from pyspark.sql import functions as F
    from dbt_project_spark.queries_timeseries import mk_trend_sen_slope

    DAY = 86400
    T0 = 1_700_000_000 - (1_700_000_000 % DAY)

    def write(vals):
        rows = [
            (i, float(T0 + i * DAY + 60), 1, "view", float(v), "{}")
            for i, v in enumerate(vals)
        ]
        spark.createDataFrame(
            rows,
            "event_id bigint, __ep double, user_id bigint,"
            " event_type string, value double, props string",
        ).select(
            "event_id",
            F.timestamp_seconds(F.col("__ep")).alias("ts"),
            "user_id", "event_type", "value", "props",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "events.parquet")
        )

    # +$2/day over 6 days
    write([10 + 2 * i for i in range(6)])
    r = mk_trend_sen_slope(spark, str(tmp_path)).collect()[0]
    n = 6
    assert r["n_days"] == n
    assert r["n_pairs"] == n * (n - 1) // 2
    assert r["s_stat"] == n * (n - 1) // 2  # every pair increasing
    assert r["var18"] == n * (n - 1) * (2 * n + 5)  # no ties
    assert r["sen_slope_per_day"] == 200.0  # +200 cents/day

    # constant series: S = 0, ties wipe the variance term
    write([5.0] * 6)
    r = mk_trend_sen_slope(spark, str(tmp_path)).collect()[0]
    assert r["s_stat"] == 0
    assert r["var18"] == 0  # one tie group of size 6 cancels exactly
    assert r["sen_slope_per_day"] == 0.0


def test_ks_exponential_detects_metronome(spark, tmp_path):
    """Constant gaps (a metronome) are maximally non-exponential:
    the fitted exponential CDF at the single gap value g with mean g
    is 1 − e⁻¹ ≈ 0.632, while the ECDF jumps to 1 → D ≈ 0.368. A
    numpy-free closed form, replicated exactly."""
    import math

    from pyspark.sql import functions as F
    from dbt_project_spark.queries_timeseries import (
        ks_exponential_interarrival,
    )

    T0 = 1_700_000_000
    rows = [
        (i, float(T0 + 60 * i), 1, "view", 1.0, "{}") for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, __ep double, user_id bigint, event_type string,"
        " value double, props string",
    ).select(
        "event_id", F.timestamp_seconds(F.col("__ep")).alias("ts"),
        "user_id", "event_type", "value", "props",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = ks_exponential_interarrival(spark, str(tmp_path)).collect()[0]
    assert r["n_gaps"] == 9
    assert r["at_gap_s"] == 60
    expected = round(abs(1.0 - (1.0 - math.exp(-1.0))) * 1e9) // 1000
    assert r["ks_d_micro"] == expected  # ≈ 367879


def test_dft_weekly_power_sinusoid_vs_flat(spark, tmp_path):
    """A planted 7-day square-wave series has large weekly power; a
    constant series has exactly zero."""
    from pyspark.sql import functions as F
    from dbt_project_spark.queries_timeseries import dft_weekly_power

    DAY = 86400
    T0 = 1_700_000_000 - (1_700_000_000 % DAY)

    def write(vals):
        rows = [
            (i, float(T0 + i * DAY + 60), 1, "view", float(v), "{}")
            for i, v in enumerate(vals)
        ]
        spark.createDataFrame(
            rows,
            "event_id bigint, __ep double, user_id bigint,"
            " event_type string, value double, props string",
        ).select(
            "event_id",
            F.timestamp_seconds(F.col("__ep")).alias("ts"),
            "user_id", "event_type", "value", "props",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "events.parquet")
        )

    # weekly square wave over exactly 4 weeks: one high day per week
    write([100.0 if i % 7 == 0 else 10.0 for i in range(28)])
    r = dft_weekly_power(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 28
    assert int(r["weekly_power"]) > 0
    weekly = int(r["weekly_power"])

    # constant series: deviations are all zero -> power exactly 0
    write([5.0] * 28)
    r2 = dft_weekly_power(spark, str(tmp_path)).collect()[0]
    assert (r2["fc"], r2["fs"]) == (0, 0)
    assert int(r2["weekly_power"]) == 0
    assert weekly > 0


def test_lift_chart_perfect_score_separation(spark, tmp_path):
    """20 users; the top-scoring 4 (deciles 1-2) are exactly the
    buyers → decile-1/2 lift = 5×, cumulative capture hits 100% at
    decile 2, later deciles are 0."""
    from pyspark.sql import functions as F
    from dbt_project_spark.queries_product import lift_chart_deciles

    T0 = 1_700_000_000
    rows = []
    eid = 0
    for u in range(20):
        score = 1000 - u  # user 0 highest
        rows.append((eid, float(T0 + 10), u, "view", float(score), "{}"))
        eid += 1
        if u < 4:  # top scorers buy in period 2
            rows.append((eid, float(T0 + 100000), u, "purchase", 1.0, "{}"))
            eid += 1
        else:
            rows.append((eid, float(T0 + 100000), u, "view", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, __ep double, user_id bigint, event_type string,"
        " value double, props string",
    ).select(
        "event_id", F.timestamp_seconds(F.col("__ep")).alias("ts"),
        "user_id", "event_type", "value", "props",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r["decile"]: r for r in lift_chart_deciles(spark, str(tmp_path)).collect()}
    assert len(out) == 10 and all(out[d]["n_users"] == 2 for d in out)
    assert out[1]["n_buyers"] == 2 and out[2]["n_buyers"] == 2
    assert all(out[d]["n_buyers"] == 0 for d in range(3, 11))
    # lift = (2/2) / (4/20) = 5x
    assert out[1]["lift_micro"] == 5_000_000
    assert out[2]["cum_capture_micro"] == 1_000_000
    assert out[10]["cum_capture_micro"] == 1_000_000
