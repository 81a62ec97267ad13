"""Bit-identity of the r13 attribution_markov_removal driver fixed
point vs the distributed 24-round loop (the graph driver-kernel
convention): forcing _MK_DRIVER_MAX = 0 routes the SAME planted
corpus through the distributed path, and the outputs must match
row-for-row — including the dangling-dst skip (a dst that never
occurs as src joins nothing) and the zero-removal-effect floor."""

import pyspark.sql.functions as F  # noqa: F401  (parity with suite style)
import pytest

import dbt_project_spark.queries_temporal as QT


def _events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string,"
        " ts timestamp, value double, session_id string",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


@pytest.fixture()
def planted(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # journeys: mixes of click/view/signup/error ending in purchase or
    # dangling (NULL absorption); one single-event journey
    J = [
        ["click", "view", "purchase"],
        ["view", "view", "click", "purchase", "click"],  # truncates at fp
        ["signup", "error", "click"],
        ["click"],
        ["error", "purchase"],
        ["view", "signup", "view", "signup", "purchase"],
    ]
    for uid, seq in enumerate(J):
        for i, et in enumerate(seq):
            rows.append(
                (
                    eid,
                    uid,
                    et,
                    t0 + dt.timedelta(minutes=eid),
                    1.0,
                    f"s{uid}",
                )
            )
            eid += 1
    _events(spark, tmp_path, rows)
    return str(tmp_path)


def test_driver_matches_distributed(spark, planted, monkeypatch):
    got = sorted(
        map(
            tuple,
            QT.attribution_markov_removal(spark, planted).collect(),
        )
    )
    assert len(got) > 0
    monkeypatch.setattr(QT, "_MK_DRIVER_MAX", 0)
    want = sorted(
        map(
            tuple,
            QT.attribution_markov_removal(spark, planted).collect(),
        )
    )
    assert got == want


def test_driver_path_is_taken_by_default(spark, planted):
    # the plan of the final frame must be a local/RDD relation when the
    # kernel fires (no 24-round join lineage)
    df = QT.attribution_markov_removal(spark, planted)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    assert "Join" not in plan
