"""Planted tests for the CEP burst detector and bitmap activity
stats: hand-placed error timings and hand-packed day masks."""

from pyspark.sql import functions as F

DAY = 86400
T0 = 1_700_000_000 - (1_700_000_000 % DAY)


def _write_events(spark, path, rows):
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


def test_error_burst_trigger_once_per_burst(spark, tmp_path):
    """u1: errors at +0/+100/+200 s — ONE burst trigger (first
    crossing), max in-window count 3. u2: errors 2 h apart — never
    2 in the window, excluded. Views are ignored."""
    from dbt_project_spark.queries_timeseries import error_burst_detect

    rows = [
        (0, T0 + 0, 1, "error", 1.0),
        (1, T0 + 100, 1, "error", 1.0),
        (2, T0 + 200, 1, "error", 1.0),
        (3, T0 + 50, 1, "view", 1.0),
        (4, T0 + 0, 2, "error", 1.0),
        (5, T0 + 7200, 2, "error", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = error_burst_detect(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 1
    assert r["n_errors"] == 3
    assert r["n_bursts"] == 1
    assert r["max_burst_size"] == 3


def test_error_burst_separate_bursts_counted(spark, tmp_path):
    """Two bursts separated by > window: each triggers once."""
    from dbt_project_spark.queries_timeseries import error_burst_detect

    rows = [
        (0, T0 + 0, 1, "error", 1.0),
        (1, T0 + 10, 1, "error", 1.0),
        # second burst, 2h later (outside the 3600 s window)
        (2, T0 + 8000, 1, "error", 1.0),
        (3, T0 + 8010, 1, "error", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    r = error_burst_detect(spark, str(tmp_path)).collect()[0]
    assert r["n_bursts"] == 2
    assert r["max_burst_size"] == 2


def test_activity_bitmask_hand_packed(spark, tmp_path):
    """u1 active on days 0,1,2,5 → mask 0b100111, streak 3;
    u2 active on day 0 only → mask 1, streak 1."""
    from dbt_project_spark.queries_mining import activity_bitmask_stats

    rows = []
    eid = 0
    for day in (0, 1, 2, 5):
        rows.append((eid, T0 + day * DAY + 60, 1, "view", 1.0))
        eid += 1
    # two events same day must not double-set bits
    rows.append((eid, T0 + 5 * DAY + 120, 1, "click", 1.0))
    eid += 1
    rows.append((eid, T0 + 0 * DAY + 60, 2, "view", 1.0))
    _write_events(spark, tmp_path, rows)
    out = {
        r["user_id"]: r
        for r in activity_bitmask_stats(spark, str(tmp_path)).collect()
    }
    u1, u2 = out[1], out[2]
    assert u1["mask"] == 0b100111
    assert u1["active_days"] == 4 == u1["active_days_bits"]
    assert u1["longest_streak"] == 3
    assert u2["mask"] == 1
    assert u2["active_days"] == 1 == u2["active_days_bits"]
    assert u2["longest_streak"] == 1
