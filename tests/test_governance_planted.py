"""Planted-semantics tests for the governance family (r4s3): tiny
synthetic tables where every output has a KNOWN closed-form answer —
planted violations for each dq_audit check, symmetric classes → zero
WOE/IV, constant series → zero forecast error, known paths → known
trigram supports, sample ⊇ data → sketch estimate equals exact. These
pin MEANING; the oracle gate pins cross-engine agreement."""

import pytest

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


def _write(spark, path, name, data, schema):
    spark.createDataFrame(data, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(path / f"{name}.parquet"))


def test_dq_audit_planted_violations(spark, tmp_path):
    from dbt_project_spark.queries_governance import dq_audit

    # orders: dup key (1,1), orphan custkey 99, bad status 'X',
    # totalprice 0 → one violation per orders check
    _write(
        spark,
        tmp_path,
        "orders",
        [
            (1, 10, "O", 100.0),
            (1, 10, "F", 50.0),
            (2, 99, "X", 0.0),
            (3, 11, "P", 25.0),
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double",
    )
    _write(spark, tmp_path, "customer", [(10,), (11,)], "c_custkey bigint")
    _write(
        spark,
        tmp_path,
        "lineitem",
        [(1, 1.0), (2, 99.0), (3, 50.0)],
        "l_orderkey bigint, l_quantity double",
    )
    _write_events(
        spark,
        tmp_path,
        [
            (0, T0, 1, "view", 1.0),
            (1, T0 + 1, 2, "teleport", 2.0),  # bad type
            (2, T0 + 2, None, "click", -5.0),  # null user AND negative value
        ],
    )
    _write(
        spark,
        tmp_path,
        "documents",
        [(0, "hello", "en", "s", 5), (1, "", "en", "s", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got = {
        r["check_name"]: (r["rows_checked"], r["violations"], r["passed"])
        for r in dq_audit(spark, str(tmp_path)).collect()
    }
    assert got["orders_orderkey_unique"] == (4, 1, False)
    assert got["orders_custkey_ri_customer"] == (4, 1, False)
    assert got["orders_status_accepted"] == (4, 1, False)
    assert got["orders_totalprice_positive"] == (4, 1, False)
    assert got["lineitem_quantity_range"] == (3, 1, False)
    assert got["events_type_accepted"] == (3, 1, False)
    assert got["events_value_nonnegative"] == (3, 1, False)
    assert got["events_user_not_null"] == (3, 1, False)
    assert got["documents_text_nonempty"] == (2, 1, False)


def test_woe_symmetric_classes_zero(spark, tmp_path):
    from dbt_project_spark.queries_governance import woe_iv_value

    # Equal class shares in the single populated bucket → WOE = ln(1) = 0
    rows = [
        (0, T0, 1, "purchase", 10.0),
        (1, T0 + 1, 1, "purchase", 11.0),
        (2, T0 + 2, 2, "view", 12.0),
        (3, T0 + 3, 2, "view", 13.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = woe_iv_value(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_conv"], r["n_nonconv"]) == (2, 2)
    assert r["woe_micro"] == 0
    assert r["iv_micro"] == 0


def test_woe_sign_tracks_conversion_enrichment(spark, tmp_path):
    from dbt_project_spark.queries_governance import woe_iv_value

    # Bucket 0 ($0-50): conversion-rich; bucket 1 ($50-100): conversion-poor
    rows = (
        [(i, T0 + i, 1, "purchase", 10.0) for i in range(3)]
        + [(10, T0 + 10, 2, "view", 10.0)]
        + [(20, T0 + 20, 3, "purchase", 60.0)]
        + [(30 + i, T0 + 30 + i, 4, "view", 60.0) for i in range(3)]
    )
    _write_events(spark, tmp_path, rows)
    out = {r["bkt"]: r for r in woe_iv_value(spark, str(tmp_path)).collect()}
    assert out[0]["woe_micro"] > 0  # conversion-enriched bucket
    assert out[1]["woe_micro"] < 0  # conversion-depleted bucket
    assert out[0]["iv_micro"] == out[1]["iv_micro"] > 0  # shared total


def test_seasonal_naive_constant_series_zero_error(spark, tmp_path):
    from dbt_project_spark.queries_governance import (
        SEASON_LAG_DAYS,
        seasonal_naive_forecast,
    )

    n_days = 12
    rows = [(d, T0 + d * DAY, 1, "view", 50.0) for d in range(n_days)]
    _write_events(spark, tmp_path, rows)
    out = seasonal_naive_forecast(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == n_days - SEASON_LAG_DAYS
    assert r["mae_cents"] == 0
    assert r["bias_cents"] == 0
    assert r["smape"] == 0.0


def test_seasonal_naive_calendar_join_skips_gap_days(spark, tmp_path):
    from dbt_project_spark.queries_governance import seasonal_naive_forecast

    # 14 days, day 9 missing: day 9 has no actual, day 16 would need
    # day 9 — a LAG(7 rows) would silently misalign; the calendar join
    # must drop exactly the days whose d−7 is absent.
    days = [d for d in range(14) if d != 9]
    rows = [(d, T0 + d * DAY, 1, "view", 100.0 + d) for d in days]
    _write_events(spark, tmp_path, rows)
    r = seasonal_naive_forecast(spark, str(tmp_path)).collect()[0]
    # backtest days: d in 7..13 with both d and d-7 present → 7,8,10,11,12,13
    assert r["n_days"] == 6
    # actual − forecast = (100+d) − (100+d−7) = 7 per day, ×100 cents
    assert r["bias_cents"] == 6 * 700
    assert r["mae_cents"] == 6 * 700


def test_seq_trigram_counts_and_day_boundary(spark, tmp_path):
    from dbt_project_spark.queries_governance import seq_trigram_support

    # Two users run view>click>purchase>error on day 0; one event at
    # day 1 would only extend a trigram ACROSS midnight → excluded.
    rows = []
    eid = 0
    for u in (1, 2):
        for i, t in enumerate(["view", "click", "purchase", "error"]):
            rows.append((eid, T0 + u * 100 + i, u, t, 1.0))
            eid += 1
    rows.append((eid, T0 + DAY + 1, 1, "signup", 1.0))  # next day
    _write_events(spark, tmp_path, rows)
    got = {
        r["trigram"]: r["support"]
        for r in seq_trigram_support(spark, str(tmp_path)).collect()
    }
    assert got == {"view>click>purchase": 2, "click>purchase>error": 2}


def test_quantile_sketch_small_corpus_equals_exact(spark, tmp_path):
    from dbt_project_spark.queries_governance import quantile_sketch_rollup

    # 100 events over 3 days, values 1..100 → n < K so the merged
    # sample IS the corpus: estimates equal exact interpolated
    # percentiles and the rank gates must hold.
    rows = [
        (i, T0 + (i % 3) * DAY + i, 1 + i % 5, "view", float(i + 1))
        for i in range(100)
    ]
    _write_events(spark, tmp_path, rows)
    r = quantile_sketch_rollup(spark, str(tmp_path)).collect()[0]
    assert r["sample_k"] == 100
    assert r["est_p50"] == pytest.approx(50.5)  # percentile(v, .5) of 1..100
    assert r["est_p90"] == pytest.approx(90.1)
    assert r["p50_in_rank_tol"] and r["p90_in_rank_tol"]


def test_weighted_sssp_prefers_cheap_two_hop(spark):
    from dbt_project_spark.operators.graph import weighted_sssp

    edges = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 10), (1, 3, 100), (5, 6, 1)],
        "src bigint, dst bigint, cost bigint",
    )
    got = {r["node"]: r["cost"] for r in weighted_sssp(edges, iters=4).collect()}
    # source = min node (1); node 3 via the cheap 2-hop path; 5→6
    # component unreachable from 1 → absent (5 itself only as source-side)
    assert got[1] == 0
    assert got[2] == 10
    assert got[3] == 20
    assert 6 not in got and 5 not in got


def test_weighted_sssp_hop_bound_semantics(spark):
    from dbt_project_spark.operators.graph import weighted_sssp

    # chain 1→2→3→4, cheap; direct 1→4 expensive. iters=1 can only
    # reach node 2 (and the expensive direct edge); iters=3 finds the
    # cheap chain.
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 50)],
        "src bigint, dst bigint, cost bigint",
    )
    one = {r["node"]: r["cost"] for r in weighted_sssp(edges, iters=1).collect()}
    assert one == {1: 0, 2: 1, 4: 50}
    three = {r["node"]: r["cost"] for r in weighted_sssp(edges, iters=3).collect()}
    assert three == {1: 0, 2: 1, 3: 2, 4: 3}


def test_markov_backtest_time_split_and_accuracy(spark, tmp_path):
    from dbt_project_spark.queries_governance import _V100  # noqa: F401
    from dbt_project_spark.queries_product import markov_next_event_backtest

    # user 1 (epochs 0..9, all in the first half): alternating
    # view/click → trains view→click and click→view.
    rows = [
        (i, T0 + i, 1, "view" if i % 2 == 0 else "click", 1.0)
        for i in range(10)
    ]
    # user 2 (epochs 100000..): the test half — path view,view,click,view
    for j, t in enumerate(["view", "view", "click", "view"]):
        rows.append((100 + j, T0 + 100_000 + j, 2, t, 1.0))
    _write_events(spark, tmp_path, rows)
    got = {
        r["from_type"]: r
        for r in markov_next_event_backtest(spark, str(tmp_path)).collect()
    }
    # test pairs: view→view (wrong), view→click (right), click→view (right)
    assert got["view"]["predicted_next"] == "click"
    assert (got["view"]["n_test"], got["view"]["n_correct"]) == (2, 1)
    assert got["view"]["acc_micro"] == 500000
    assert got["click"]["predicted_next"] == "view"
    assert got["click"]["acc_micro"] == 1000000


def test_join_size_estimate_exact_when_sample_covers_domain(spark, tmp_path):
    from dbt_project_spark.queries_governance import join_size_sample_estimate

    _write(
        spark,
        tmp_path,
        "orders",
        [(1, 1, "O", 1.0), (2, 1, "O", 1.0), (3, 2, "O", 1.0)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double",
    )
    _write_events(
        spark,
        tmp_path,
        [(0, T0, 1, "view", 1.0), (1, T0 + 1, 2, "view", 1.0), (2, T0 + 2, 2, "click", 1.0)],
    )
    r = join_size_sample_estimate(spark, str(tmp_path)).collect()[0]
    # f_orders = {1:2, 2:1}; f_events = {1:1, 2:2} → exact = 2·1 + 1·2 = 4
    assert r["exact_rows"] == 4
    assert r["n_keys"] == 2 and r["sample_k"] == 2  # sample ⊇ domain
    assert r["est_rows"] == 4  # scaling factor 1 → estimate is exact
    assert r["within_30pct"]


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    from dbt_project_spark.queries_governance import incremental_rollup_merge

    # 12 days × 2 users × 2 types, values varying — split lands mid-data
    rows = []
    eid = 0
    for d in range(12):
        for u in (1, 2):
            for k, t in enumerate(("view", "purchase")):
                rows.append((eid, T0 + d * DAY + u, u, t, float(d + k + 1)))
                eid += 1
    _write_events(spark, tmp_path, rows)
    got = {
        (r["user_id"], r["event_type"]): (r["n_events"], r["total_cents"])
        for r in incremental_rollup_merge(spark, str(tmp_path)).collect()
    }
    # full recompute, independently: each (u, t) has 12 events, one per
    # day, value d + k + 1 → cents total = 100·Σ(d+k+1)
    for u in (1, 2):
        for k, t in enumerate(("view", "purchase")):
            expected = 100 * sum(d + k + 1 for d in range(12))
            assert got[(u, t)] == (12, expected)


def test_attribution_u_shape_credit_split(spark, tmp_path):
    from dbt_project_spark.queries_temporal import attribution_u_shape

    # user 1 journey: view, click, error, signup, view → purchase
    # (n=5: first view 4000; last view 4000+rem, rem = 2000-666*3 = 2;
    #  middles click/error/signup 666 each)
    rows = []
    for i, t in enumerate(["view", "click", "error", "signup", "view"]):
        rows.append((i, T0 + i, 1, t, 1.0))
    rows.append((5, T0 + 5, 1, "purchase", 9.0))
    # user 2: single touch then purchase → 10000; then a trailing
    # touch with NO closing purchase → zero credit, not counted
    rows.append((10, T0 + 10, 2, "click", 1.0))
    rows.append((11, T0 + 11, 2, "purchase", 9.0))
    rows.append((12, T0 + 12, 2, "view", 1.0))
    # user 3: two touches → 5000/5000
    rows.append((20, T0 + 20, 3, "error", 1.0))
    rows.append((21, T0 + 21, 3, "signup", 1.0))
    rows.append((22, T0 + 22, 3, "purchase", 9.0))
    _write_events(spark, tmp_path, rows)
    got = {
        r["touch_type"]: (r["n_touches"], r["credit_bp"])
        for r in attribution_u_shape(spark, str(tmp_path)).collect()
    }
    # per journey the credits sum to exactly 10000
    assert sum(v[1] for v in got.values()) == 3 * 10000
    assert got["view"] == (2, 4000 + 4000 + 2)  # first + last(+rem) of journey 1
    assert got["click"] == (2, 666 + 10000)  # middle of j1 + solo of user 2
    assert got["error"] == (2, 666 + 5000)
    assert got["signup"] == (2, 666 + 5000)


def test_containment_catches_small_doc_inside_big(spark, tmp_path):
    from dbt_project_spark.queries_dedup import dedup_containment

    words = [f"w{i}" for i in range(60)]
    big = " ".join(words)
    small = " ".join(words[:12])  # contiguous prefix → all shingles shared
    other = " ".join(f"z{i}" for i in range(30))
    _write(
        spark,
        tmp_path,
        "documents",
        [(1, big, "en", "s", len(big)), (2, small, "en", "s", len(small)),
         (3, other, "en", "s", len(other))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rows = dedup_containment(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["containment"] == 1.0  # the quote is fully contained
    assert r["jaccard"] < 0.3  # ...but Jaccard-only dedup misses it


def test_user_lifecycle_stage_decomposition(spark, tmp_path):
    from dbt_project_spark.queries_product import user_lifecycle_daily

    # u1 active days 0,1,3 → new@0, retained@1, churned@2, resurrected@3
    # u2 active day 1 only → new@1, churned@2
    rows = [
        (0, T0, 1, "view", 1.0),
        (1, T0 + DAY, 1, "view", 1.0),
        (2, T0 + 3 * DAY, 1, "view", 1.0),
        (3, T0 + DAY + 5, 2, "click", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r["day"]: (r["n_new"], r["n_retained"], r["n_resurrected"], r["n_churned"])
        for r in user_lifecycle_daily(spark, str(tmp_path)).collect()
    }
    days = sorted(got)
    assert len(days) == 4
    assert got[days[0]] == (1, 0, 0, 0)
    assert got[days[1]] == (1, 1, 0, 0)
    assert got[days[2]] == (0, 0, 0, 2)  # both users absent on day 2
    assert got[days[3]] == (0, 0, 1, 0)  # u1 returns after the gap
    # growth identity: DAU(d) − DAU(d−1) = new + res − churned
    dau = {days[0]: 1, days[1]: 2, days[2]: 0, days[3]: 1}
    for prev, cur in zip(days, days[1:]):
        n, rt, rs, ch = got[cur]
        assert dau[cur] - dau[prev] == n + rs - ch


def test_part_demand_xyz_classes(spark, tmp_path):
    from dbt_project_spark.queries_retail import part_demand_xyz

    # 4 global weeks. Part 1: constant 10/week → cv² = 0 → X.
    # Part 2: one demand spike (40,0,0,0): mean 10, var = (4·1600−1600²/…)
    #   cv² = (n·Σq²−(Σq)²)/(Σq)² = (4·1600−1600)/1600 = 3 → Z.
    wk = 604800
    rows = []
    ok = 1
    for w in range(4):
        rows.append((ok, 1, w))  # (orderkey, partkey→1 qty 10) below
        ok += 1
    data_orders = [(k, 1, "O", 1.0, float(T0 + w * wk)) for k, w in
                   [(1, 0), (2, 1), (3, 2), (4, 3), (5, 0)]]
    df_o = spark.createDataFrame(
        [(k, c, s, p, ts) for k, c, s, p, ts in data_orders],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, __ep double",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.timestamp_seconds(F.col("__ep")).alias("o_orderdate"),
    )
    df_o.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    li = [(k, 1, 10.0) for k in (1, 2, 3, 4)] + [(5, 2, 40.0)]
    _write(
        spark,
        tmp_path,
        "lineitem",
        li,
        "l_orderkey bigint, l_partkey bigint, l_quantity double",
    )
    got = {
        r["l_partkey"]: (r["weeks_active"], r["cv2_micro"], r["xyz_class"])
        for r in part_demand_xyz(spark, str(tmp_path)).collect()
    }
    assert got[1] == (4, 0, "X")  # constant demand
    assert got[2] == (1, 3_000_000, "Z")  # single spike, cv² = 3


def test_funnel_time_to_convert_latency(spark, tmp_path):
    from dbt_project_spark.queries_product import funnel_time_to_convert

    # u1 converts in 100 s; u2 in 300 s; u3 never clicks → excluded
    rows = [
        (0, T0, 1, "view", 1.0),
        (1, T0 + 40, 1, "click", 1.0),
        (2, T0 + 100, 1, "purchase", 1.0),
        (10, T0 + 1000, 2, "view", 1.0),
        (11, T0 + 1100, 2, "click", 1.0),
        (12, T0 + 1300, 2, "purchase", 1.0),
        (20, T0 + 5000, 3, "view", 1.0),
        (21, T0 + 5100, 3, "purchase", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    r = funnel_time_to_convert(spark, str(tmp_path)).collect()[0]
    assert r["n_converters"] == 2
    assert r["p50_latency_s"] == 200.0  # midpoint of {100, 300}
    assert r["mean_latency_s"] == 200.0


def test_graph_diagnostics_closed_form(spark):
    """Crafted graph with known closed-form diagnostics: 1↔2
    (reciprocal pair) and 3→4 (one-way). Degrees {1:2, 2:2, 3:1, 4:1};
    endpoint-degree pairs (2,2),(2,2),(1,1) → assortativity numerator
    m·Σxy − ΣxΣy = 3·9 − 25 = 2 (positively assortative: hubs link
    hubs); reciprocity = 2/3."""
    from dbt_project_spark.operators.graph import graph_diagnostics

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4)], "src bigint, dst bigint"
    )
    r = graph_diagnostics(edges).collect()[0]
    assert r["n_nodes"] == 4
    assert r["n_edges"] == 3
    assert r["reciprocity_micro"] == 2_000_000 // 3
    assert r["assort_num"] == "2"
    # den² = (3·9 − 25)·(3·9 − 25) = 4  (Σx² = 4+4+1 = 9)
    assert r["assort_den_sq"] == "4"


def test_k_anonymity_counts(spark, tmp_path):
    from dbt_project_spark.queries_governance import k_anonymity_audit

    # QI = (type, $5 bucket, day): 6 'view'@$1 same day (safe class),
    # 1 'click'@$1 (singleton), 2 'error'@$7 (small class)
    rows = (
        [(i, T0 + i, 1, "view", 1.0) for i in range(6)]
        + [(10, T0 + 10, 2, "click", 1.0)]
        + [(20, T0 + 20, 3, "error", 7.0), (21, T0 + 21, 4, "error", 7.0)]
    )
    _write_events(spark, tmp_path, rows)
    r = k_anonymity_audit(spark, str(tmp_path)).collect()[0]
    assert r["n_rows"] == 9 and r["n_groups"] == 3
    assert r["k_min"] == 1
    assert r["groups_lt_k"] == 2 and r["rows_lt_k"] == 3
    assert r["risky_micro"] == 3 * 1000000 // 9


def test_ts_decompose_additive_identity_and_constant_series(spark, tmp_path):
    from dbt_project_spark.queries_timeseries import ts_decompose_daily

    # constant daily total → trend = total, seasonal = 0, residual = 0
    rows = [(d, T0 + d * DAY, 1, "view", 70.0) for d in range(21)]
    _write_events(spark, tmp_path, rows)
    out = ts_decompose_daily(spark, str(tmp_path)).collect()
    assert len(out) == 21 - 6  # days with the full centered 7-day window
    for r in out:
        assert r["trend_cents"] == 7000
        assert r["seasonal_cents"] == 0
        assert r["residual_cents"] == 0
        assert (
            r["total_cents"]
            == r["trend_cents"] + r["seasonal_cents"] + r["residual_cents"]
        )


def test_ts_decompose_recovers_weekly_seasonality(spark, tmp_path):
    from dbt_project_spark.queries_timeseries import ts_decompose_daily

    # 28 days: base 100, +70 every 7th day → the weekly bump must land
    # in the seasonal component, not the residual. Centered MA of a
    # 7-periodic series is flat, so seasonal ≈ detrended exactly.
    rows = [
        (d, T0 + d * DAY, 1, "view", 100.0 + (70.0 if d % 7 == 0 else 0.0))
        for d in range(28)
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["day"]: r for r in ts_decompose_daily(spark, str(tmp_path)).collect()}
    for r in out.values():
        # trend = (6·100 + 170)/7 = 110 exactly, every full-window day
        assert r["trend_cents"] == 11000
        assert (
            r["total_cents"]
            == r["trend_cents"] + r["seasonal_cents"] + r["residual_cents"]
        )
        if r["total_cents"] == 17000:  # bump day
            assert r["seasonal_cents"] == 6000 and r["residual_cents"] == 0
        else:
            assert r["seasonal_cents"] == -1000 and r["residual_cents"] == 0


def test_stickiness_partial_and_full_windows(spark, tmp_path):
    from dbt_project_spark.queries_analytics import stickiness_dau_mau

    # u1 active every day 0..4; u2 active only day 2
    rows = [(d, T0 + d * DAY, 1, "view", 1.0) for d in range(5)]
    rows.append((10, T0 + 2 * DAY + 5, 2, "view", 1.0))
    _write_events(spark, tmp_path, rows)
    got = {
        r["day"]: (r["n_dau"], r["n_mau"], r["stickiness_micro"])
        for r in stickiness_dau_mau(spark, str(tmp_path)).collect()
    }
    days = sorted(got)
    assert got[days[0]] == (1, 1, 1000000)  # day 0: only u1 ever seen
    assert got[days[2]] == (2, 2, 1000000)  # day 2: both active
    # day 3: u1 active; MAU window covers u1+u2 → 1/2
    assert got[days[3]] == (1, 2, 500000)


def test_user_decay_score_dyadic_weights(spark, tmp_path):
    from dbt_project_spark.queries_analytics import user_decay_score

    # max day = day 28. Ages: 0w → weight 16, 2w → 4, ≥4w → 1.
    rows = [
        (0, T0 + 28 * DAY, 1, "view", 1.0),   # this week: 100¢ × 16
        (1, T0 + 14 * DAY, 1, "view", 1.0),   # 2 weeks old: 100¢ × 4
        (2, T0, 1, "view", 1.0),              # 4 weeks old: 100¢ × 1
        (3, T0, 2, "view", 2.0),              # old-only user: 200¢ × 1
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: (r["decay_score"], r["last_active_ed"])
        for r in user_decay_score(spark, str(tmp_path)).collect()
    }
    base_ed = T0 // DAY
    assert got[1] == (100 * 16 + 100 * 4 + 100 * 1, base_ed + 28)
    assert got[2] == (200, base_ed)


def test_revenue_hhi_monopoly_vs_uniform(spark, tmp_path):
    from dbt_project_spark.queries_retail import revenue_hhi_nation

    def write_case(path, nations):
        # one order + lineitem per (custkey, price); customer c in nation n
        _write(
            spark, path, "customer",
            [(c, n) for c, n in enumerate(nations)],
            "c_custkey bigint, c_nationkey bigint",
        )
        _write(
            spark, path, "orders",
            [(c, c) for c in range(len(nations))],
            "o_orderkey bigint, o_custkey bigint",
        )
        _write(
            spark, path, "lineitem",
            [(c, 100.0) for c in range(len(nations))],
            "l_orderkey bigint, l_extendedprice double",
        )

    # uniform across 4 nations → share 250‰ each → HHI = 4·250² = 250000
    p1 = tmp_path / "uniform"; p1.mkdir()
    write_case(p1, [0, 1, 2, 3])
    r = revenue_hhi_nation(spark, str(p1)).collect()[0]
    assert r["n_groups"] == 4
    assert r["hhi_permille_sq"] == 4 * 250 * 250
    assert r["top_share_micro"] == 250000

    # monopoly → share 1000‰ → HHI = 1000000
    p2 = tmp_path / "mono"; p2.mkdir()
    write_case(p2, [0, 0, 0, 0])
    r = revenue_hhi_nation(spark, str(p2)).collect()[0]
    assert r["n_groups"] == 1
    assert r["hhi_permille_sq"] == 1000000
