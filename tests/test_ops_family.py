"""Planted-semantics tests for the ops/reliability family (r4s4):
closed-form SPC flags, profile-drift deltas, a textbook Kaplan–Meier
life table, and a multi-file parquet manifest. These pin MEANING; the
DuckDB oracle gate pins cross-engine agreement."""

import math

from pyspark.sql import functions as F

DAY = 86400
T0 = 1_700_000_000 - (1_700_000_000 % DAY)  # midnight anchor


def _write_events(spark, path, rows):
    """rows: (event_id, ts_epoch_s, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [
            (int(e), float(ts), None if u is None else int(u), t, float(v), "{}")
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
    df.coalesce(1).write.mode("overwrite").parquet(str(path / "events.parquet"))


def test_spc_pchart_planted_signal(spark, tmp_path):
    """9 in-control days at 10% error + 1 day at 90%: only the spike
    day is out of control, and the center line is the pooled rate."""
    from dbt_project_spark.queries_ops import spc_pchart_error_rate

    rows = []
    eid = 0
    for day in range(10):
        err = 9 if day == 9 else 1  # of 10 events/day
        for i in range(10):
            typ = "error" if i < err else "view"
            rows.append((eid, T0 + day * DAY + i * 60, 1, typ, 5.0))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = {
        r["day"]: r
        for r in spc_pchart_error_rate(spark, str(tmp_path)).collect()
    }
    assert len(out) == 10
    # pooled center: 18 errors / 100 events = 180000 micro
    for r in out.values():
        assert r["center_micro"] == 180_000
    flagged = [d for d, r in out.items() if r["out_of_control"]]
    spike_day = max(out)  # last day lexicographically
    assert flagged == [spike_day]
    assert out[spike_day]["rate_micro"] == 900_000
    # sanity: an in-control day is exactly |0.1-0.18| < 3*sqrt(.18*.82/10)
    d0 = min(out)
    assert out[d0]["rate_micro"] == 100_000


def test_profile_drift_planted_deltas(spark, tmp_path):
    """Second half gains a null user_id and a new event_type."""
    from dbt_project_spark.queries_ops import profile_drift_halves

    rows = [
        # first half: 4 rows, users {1,2}, types {view}
        (0, T0 + 0, 1, "view", 1.0),
        (1, T0 + 10, 1, "view", 2.0),
        (2, T0 + 20, 2, "view", 3.0),
        (3, T0 + 30, 2, "view", 4.0),
        # second half: null user + new type appear
        (4, T0 + 1000, None, "view", 5.0),
        (5, T0 + 1010, 3, "signup", 6.0),
        (6, T0 + 1020, 3, "view", 7.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r["half"]: r for r in profile_drift_halves(spark, str(tmp_path)).collect()
    }
    ref, cur = out["ref"], out["cur"]
    assert ref["n_rows"] == 4 and cur["n_rows"] == 3
    assert ref["null_users"] == 0 and cur["null_users"] == 1
    assert ref["n_types"] == 1 and cur["n_types"] == 2
    assert ref["sum_v100"] == 1000 and cur["sum_v100"] == 1800
    # mean micro-dollars: 10.00/4 = 2.5 -> 2_500_000
    assert ref["mean_value_micro"] == 2_500_000


def test_kaplan_meier_textbook_life_table(spark, tmp_path):
    """5 users: deaths at t=10 (×2) and t=50, censored at 40 and 100.
    KM: n=5,d=2 at t10; n=2,d=1 at t50 (the t=40 censor leaves the
    risk set first) — the textbook product-limit walk-through."""
    from dbt_project_spark.queries_ops import kaplan_meier_retention

    # (user, first_day, last_day); observation end = day 100
    users = [
        (1, 0, 10),  # death, t=10
        (2, 0, 10),  # death, t=10
        (3, 0, 50),  # death, t=50
        (4, 0, 100),  # censored, t=100
        (5, 60, 100),  # censored, t=40
    ]
    rows = []
    eid = 0
    for u, fd, ld in users:
        for d in (fd, ld):
            rows.append((eid, T0 + d * DAY + 3600, u, "view", 1.0))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = kaplan_meier_retention(spark, str(tmp_path)).collect()
    by_t = {r["t_day"]: r for r in out}
    assert sorted(by_t) == [10, 50]
    r10 = by_t[10]
    assert r10["n_risk"] == 5 and r10["deaths"] == 2 and r10["censored"] == 0
    assert r10["hazard_micro"] == 400_000
    assert r10["log_surv_nano"] == round(math.log(3 / 5) * 1e9)
    r50 = by_t[50]
    assert r50["n_risk"] == 2 and r50["deaths"] == 1
    assert r50["log_surv_nano"] == round(math.log(3 / 5) * 1e9) + round(
        math.log(1 / 2) * 1e9
    )


def test_file_stats_multifile_manifest(spark, tmp_path):
    """A 3-file table reports n_files=3 and per-file row spread."""
    from dbt_project_spark.queries_ops import _file_stats_one

    df = spark.range(0, 90).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(T0) + F.col("id")).alias("ts"),
        F.col("id").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.repartition(3).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    row = _file_stats_one(spark, str(tmp_path), "events").collect()[0]
    assert row["tbl"] == "events"
    assert row["n_files"] == 3
    assert row["total_rows"] == 90
    assert row["min_file_rows"] >= 1
    assert row["max_file_rows"] <= 90
    assert row["avg_file_rows"] == 30


def test_table_file_stats_oracle_parity_per_sf(spark):
    """The catalog query's oracle is path-baked at the driver's
    sf0.01; the local gate re-points it (oracle_check rewrite). Verify
    parity at sf0.001 through that rewrite."""
    from dbt_project_spark.catalog import ORACLES, QUERIES, load_all
    from dbt_project_spark.oracle_check import check_query

    load_all()
    r = check_query(
        spark,
        "/root/testdata/sf0.001",
        "table_file_stats",
        QUERIES["table_file_stats"],
        ORACLES["table_file_stats"],
    )
    assert r["ok"], r
