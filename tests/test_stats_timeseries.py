"""Independent (numpy/pandas) reference checks for the two-sample
statistics (KS, Mann-Whitney) and time-series diagnostics (ACF,
CUSUM) — a third implementation next to Spark and the DuckDB oracle,
so a shared-misconception bug in the SQL twins can't self-confirm."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def _events_pdf() -> pd.DataFrame:
    pdf = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    ts = pdf["ts"]
    if ts.dtype.kind == "M":  # datetime64 at parquet-declared resolution
        unit = np.datetime_data(ts.dtype)[0]
        div = {"ns": 1_000_000_000, "us": 1_000_000, "ms": 1_000, "s": 1}[unit]
    else:  # raw int64 nanos (nanosAsLong layout)
        div = 1_000_000_000
    ep = ts.astype("int64") // div
    out = pdf[["event_type", "value"]].copy()
    out["ep"] = ep.values
    out["v100"] = np.rint(pdf["value"].values * 100).astype("int64")
    return out


def test_ks_matches_numpy(spark):
    from dbt_project_spark.queries_quality import ks_test_value

    got = {
        r["event_type"]: r
        for r in ks_test_value(spark, SF_SMOKE).collect()
    }
    pdf = _events_pdf()
    mid = (pdf.ep.min() + pdf.ep.max()) // 2
    for et, g in pdf.groupby("event_type"):
        a = np.sort(g.loc[g.ep < mid, "v100"].values)
        b = np.sort(g.loc[g.ep >= mid, "v100"].values)
        xs = np.unique(np.concatenate([a, b]))
        ca = np.searchsorted(a, xs, side="right")
        cb = np.searchsorted(b, xs, side="right")
        d = np.max(np.abs(ca / len(a) - cb / len(b)))
        r = got[et]
        assert r["n_ref"] == len(a) and r["n_cur"] == len(b)
        assert abs(r["ks_d"] - d) < 2e-6, (et, r["ks_d"], d)


def test_mannwhitney_matches_pandas_ranks(spark):
    from dbt_project_spark.queries_quality import mannwhitney_value

    got = {
        r["event_type"]: r
        for r in mannwhitney_value(spark, SF_SMOKE).collect()
    }
    pdf = _events_pdf()
    mid = (pdf.ep.min() + pdf.ep.max()) // 2
    for et, g in pdf.groupby("event_type"):
        a = g.loc[g.ep < mid, "v100"].values
        b = g.loc[g.ep >= mid, "v100"].values
        allv = pd.Series(np.concatenate([a, b]))
        ranks = allv.rank(method="average").values  # midranks
        r1 = ranks[: len(a)].sum()
        u1 = r1 - len(a) * (len(a) + 1) / 2
        r = got[et]
        assert r["u_x2"] == int(round(2 * u1)), (et, r["u_x2"], u1)
        assert abs(r["cl_effect"] - u1 / (len(a) * len(b))) < 2e-6


def _hourly_series(pdf: pd.DataFrame) -> np.ndarray:
    h = pdf.ep.values // 3600
    lo, hi = h.min(), h.max()
    x = np.zeros(hi - lo + 1, dtype="int64")
    np.add.at(x, h - lo, pdf.v100.values)
    return x


def test_acf_matches_numpy(spark):
    from dbt_project_spark.queries_timeseries import ts_acf_hourly

    got = {r["lag"]: r for r in ts_acf_hourly(spark, SF_SMOKE).collect()}
    x = _hourly_series(_events_pdf()).astype("float64")
    d = x - x.mean()
    den = (d * d).sum()
    for k in range(1, 7):
        num = (d[:-k] * d[k:]).sum()
        r = got[k]
        assert r["n_pairs"] == len(x) - k
        assert abs(r["acf_micro"] / 1e6 - num / den) < 3e-6, (k,)


def test_cusum_matches_numpy(spark):
    from dbt_project_spark.queries_timeseries import ts_cusum_changepoint

    row = ts_cusum_changepoint(spark, SF_SMOKE).collect()[0]
    pdf = _events_pdf()
    ed = pdf.ep.values // 86400
    lo, hi = ed.min(), ed.max()
    x = np.zeros(hi - lo + 1, dtype="int64")
    np.add.at(x, ed - lo, pdf.v100.values)
    n, s = len(x), x.sum()
    cum = np.cumsum(n * x - s)  # exact int64 n-scaled CUSUM
    i = int(np.argmax(np.abs(cum)))  # np.argmax returns FIRST max = tie->earliest
    assert row["n_days"] == n
    assert row["peak_x_n"] == abs(int(cum[i]))
    expect_day = pd.Timestamp((lo + i) * 86400, unit="s").strftime("%Y-%m-%d")
    assert row["cp_day"] == expect_day
    before, after = x[: i + 1], x[i + 1 :]
    assert abs(row["mean_before"] - before.mean() / 100) < 1e-6
    assert abs(row["mean_after"] - after.mean() / 100) < 1e-6


def test_rolling_distinct_matches_pandas(spark):
    from dbt_project_spark.queries_analytics import (
        rolling_distinct_users_7d,
    )

    got = {
        r["day"]: (r["n_users_7d"], r["n_users_1d"])
        for r in rolling_distinct_users_7d(spark, SF_SMOKE).collect()
    }
    pdf = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    ts = pdf["ts"]
    if ts.dtype.kind == "M":
        unit = np.datetime_data(ts.dtype)[0]
        div = {"ns": 1_000_000_000, "us": 1_000_000, "ms": 1_000, "s": 1}[unit]
    else:
        div = 1_000_000_000
    ed = ts.astype("int64") // div // 86400
    pairs = set(zip(pdf["user_id"].values, ed.values))
    days = sorted({d for _, d in pairs})
    lo, hi = days[0], days[-1]
    assert len(got) == hi - lo + 1  # gap-filled over fan-out range
    for d in range(lo, hi + 1):
        users7 = {u for (u, dd) in pairs if d - 6 <= dd <= d}
        users1 = {u for (u, dd) in pairs if dd == d}
        day = pd.Timestamp(d * 86400, unit="s").strftime("%Y-%m-%d")
        assert got[day] == (len(users7), len(users1)), day


def test_gini_matches_numpy(spark):
    from dbt_project_spark.queries_quality import gini_user_value

    row = gini_user_value(spark, SF_SMOKE).collect()[0]
    pdf = _events_pdf()
    raw = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    totals = (
        pd.DataFrame({"u": raw["user_id"].values, "v": pdf["v100"].values})
        .groupby("u")["v"]
        .sum()
        .values
    )
    x = np.sort(totals).astype("float64")
    n = len(x)
    gini = (2 * np.sum(np.arange(1, n + 1) * x)) / (n * x.sum()) - (n + 1) / n
    assert row["n_users"] == n
    assert abs(row["gini"] - gini) < 2e-6


def test_entropy_matches_numpy(spark):
    from dbt_project_spark.queries_quality import entropy_type_daily

    got = {
        r["day"]: (r["n_types"], r["entropy_nats"])
        for r in entropy_type_daily(spark, SF_SMOKE).collect()
    }
    pdf = _events_pdf()
    raw = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    df = pd.DataFrame(
        {
            "day": pd.to_datetime(pdf["ep"].values * 10**9).strftime(
                "%Y-%m-%d"
            ),
            "t": raw["event_type"].values,
        }
    )
    for day, g in df.groupby("day"):
        p = g["t"].value_counts(normalize=True).values
        ent = float(-(p * np.log(p)).sum())
        n_types, got_ent = got[day]
        assert n_types == len(p)
        assert abs(got_ent - ent) < 2e-6, day


def test_benford_matches_numpy(spark):
    import math

    from dbt_project_spark.queries_quality import benford_first_digit

    rows = benford_first_digit(spark, SF_SMOKE).collect()
    pdf = _events_pdf()
    v = pdf["v100"].values
    v = v[v > 0]
    digits = np.array([int(str(x)[0]) for x in v])
    n = len(digits)
    chi2 = 0.0
    for r in rows:
        d = r["digit"]
        obs = int((digits == d).sum())
        p = math.log10(1 + 1 / d)
        assert r["n_obs"] == obs, d
        assert abs(r["expected"] - n * p) < 1e-4
        chi2 += (obs - n * p) ** 2 / (n * p)
    # micro-units are a truncation of the x1e9 term sum; allow the
    # accumulated rounding slack of 9 terms
    assert abs(rows[0]["chi2_micro"] / 1e6 - chi2) < 1e-4


def test_ab_test_arms_and_chi2(spark):
    from dbt_project_spark.queries_product import (
        AB_CONV_SPEND100,
        ab_test_conversion,
    )

    rows = {r["arm"]: r for r in ab_test_conversion(spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "B"}
    import hashlib

    raw = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    pdf = _events_pdf()
    df = pd.DataFrame({"u": raw["user_id"].values, "v": pdf["v100"].values})
    totals = df.groupby("u")["v"].sum()
    arms = {"A": [0, 0], "B": [0, 0]}  # [users, converted]
    for u, v in totals.items():
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        arm = "A" if h % 2 == 0 else "B"
        arms[arm][0] += 1
        arms[arm][1] += int(v >= AB_CONV_SPEND100)
    for arm in ("A", "B"):
        assert rows[arm]["n_users"] == arms[arm][0], arm
        assert rows[arm]["n_conv"] == arms[arm][1], arm
    a1, a0 = arms["A"][1], arms["A"][0] - arms["A"][1]
    b1, b0 = arms["B"][1], arms["B"][0] - arms["B"][1]
    if (a1 + b1) and (a0 + b0):
        nt = a1 + a0 + b1 + b0
        chi2 = nt * (a1 * b0 - a0 * b1) ** 2 / (
            (a1 + a0) * (b1 + b0) * (a1 + b1) * (a0 + b0)
        )
        assert abs(rows["A"]["chi2"] - chi2) < 1e-5
