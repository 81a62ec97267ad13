"""Planted-semantics tests for the r05 additions: known closed-form
answers for the Welch t-test, SLO burn rates, price indices, Gopher
rules, Markov removal-effect attribution, DP noise determinism, and
the LSH band-tuning monotonicity. These pin MEANING; the oracle gate
pins cross-engine agreement."""

import math

from pyspark.sql import functions as F

DAY = 86400
T0 = 1_700_000_000 - (1_700_000_000 % DAY)


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


def test_welch_ttest_planted_shift(spark, tmp_path):
    """ref half = cents [1000,1200]×2, cur half = +1000 cents: known
    means, equal variances, t = -Δ/sqrt(2v/4)."""
    from dbt_project_spark.queries_quality import welch_ttest_value

    rows = []
    for i, v in enumerate([10.0, 12.0, 10.0, 12.0]):
        rows.append((i, T0 + i, 1, "click", v))
    for i, v in enumerate([20.0, 22.0, 20.0, 22.0]):
        rows.append((10 + i, T0 + DAY + i, 1, "click", v))
    _write_events(spark, tmp_path, rows)
    r = {x["event_type"]: x for x in welch_ttest_value(spark, str(tmp_path)).collect()}
    c = r["click"]
    assert (c["n_ref"], c["n_cur"]) == (4, 4)
    assert c["mean_ref100"] == 1100.0 and c["mean_cur100"] == 2100.0
    v = (2 * (1000**2 + 1200**2) - 4400**2 / 4) / 3  # sample var per half
    t = (1100 - 2100) / math.sqrt(2 * v / 4)
    assert abs(c["t_welch"] - round(t, 6)) < 1e-6
    assert abs(c["df_welch"] - 6.0) < 1e-3  # equal n, equal var → n1+n2-2


def test_slo_burn_rate_planted_windows(spark, tmp_path):
    """2 events (1 error) in the last hour, 2 more (0 errors) a day
    earlier: burn(1h) = 0.5/0.25 = 2, burn(24h) = 0.25/0.25 = 1."""
    from dbt_project_spark.queries_ops import slo_burn_rate

    t_end = T0 + 10 * DAY
    rows = [
        (1, t_end, 1, "error", 1.0),
        (2, t_end - 600, 1, "view", 1.0),
        (3, t_end - 3 * 3600, 1, "view", 1.0),
        (4, t_end - 5 * 3600, 1, "view", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    r = {x["window_h"]: x for x in slo_burn_rate(spark, str(tmp_path)).collect()}
    assert (r[1]["n_events"], r[1]["n_errors"]) == (2, 1)
    assert r[1]["rate_micro"] == 500000 and r[1]["burn_micro"] == 2000000
    assert (r[6]["n_events"], r[6]["n_errors"]) == (4, 1)
    assert r[6]["burn_micro"] == 1000000
    assert r[24]["burn_micro"] == 1000000


def test_price_index_planted_ten_percent(spark, tmp_path):
    """One part, price 10 -> 11 with changed quantity: both Laspeyres
    and Paasche = 1.1 exactly (single matched part)."""
    from dbt_project_spark.queries_retail import price_index_laspeyres

    df = spark.createDataFrame(
        [
            (1, 10.0, 100.0, float(T0)),
            (1, 5.0, 55.0, float(T0 + 366 * DAY)),
        ],
        "l_partkey bigint, l_quantity double, l_extendedprice double,"
        " __ep double",
    ).select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        F.timestamp_seconds("__ep").alias("l_shipdate"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    r = {x["year"]: x for x in price_index_laspeyres(spark, str(tmp_path)).collect()}
    base_year = min(r)
    assert r[base_year]["laspeyres"] == 1.0 and r[base_year]["paasche"] == 1.0
    nxt = max(r)
    assert r[nxt]["laspeyres"] == 1.1 and r[nxt]["paasche"] == 1.1


def test_gopher_rules_planted_violations(spark, tmp_path):
    from dbt_project_spark.queries_corpus import corpus_gopher_rules

    # 54 distinct-ish words (no repeated bigrams), two stop words
    good = "the " + " ".join(f"w{i}abc" for i in range(26)) + " of " + " ".join(
        f"v{i}xyz" for i in range(26)
    )
    short = "the a tiny doc"
    repet = "zzz " * 60
    _write(
        spark,
        tmp_path,
        "documents",
        [(1, good, "en"), (2, short, "en"), (3, repet, "en")],
        "doc_id bigint, text string, lang string",
    )
    r = {x["doc_id"]: x for x in corpus_gopher_rules(spark, str(tmp_path)).collect()}
    assert r[1]["keep_gopher"] and r[1]["word_count_ok"]
    assert not r[2]["word_count_ok"] and not r[2]["keep_gopher"]
    assert not r[3]["top_word_ok"] and not r[3]["dup_bigram_ok"]
    assert not r[3]["stopword_ok"] and not r[3]["keep_gopher"]


def test_markov_removal_planted_chain(spark, tmp_path):
    """START->click (2/5) ->CONV; START->view (3/5), view->click (2/3)
    ->CONV, view->end (1/3). Removing click kills ALL conversion;
    removing view kills the view-path only — credit 2:1 for click."""
    from dbt_project_spark.queries_temporal import attribution_markov_removal

    rows = []
    eid = 0

    def path(u, types):
        nonlocal eid
        for i, t in enumerate(types):
            rows.append((eid, T0 + u * 1000 + i, u, t, 1.0))
            eid += 1

    path(1, ["click", "purchase"])
    path(2, ["click", "purchase"])
    path(3, ["view", "click", "purchase"])
    path(4, ["view", "click", "purchase"])
    path(5, ["view"])
    _write_events(spark, tmp_path, rows)
    r = {
        x["channel"]: x
        for x in attribution_markov_removal(spark, str(tmp_path)).collect()
    }
    # exact integer-truncation replay: v(view) = 666666,
    # base = (400000·1e6 + 600000·666666)//1e6 = 799999
    assert r["click"]["base_conv_micro"] == 799999
    assert r["click"]["removed_conv_micro"] == 0
    assert r["click"]["removal_effect_micro"] == 799999
    assert r["view"]["removed_conv_micro"] == 400000
    assert r["view"]["removal_effect_micro"] == 399999
    tot = 799999 + 399999
    assert r["click"]["attribution_micro"] == 799999 * 1000000 // tot
    assert r["view"]["attribution_micro"] == 399999 * 1000000 // tot


def test_dp_noise_deterministic_and_varied(spark, tmp_path):
    from dbt_project_spark.queries_governance import dp_noisy_daily_counts

    rows = [
        (i, T0 + (i % 3) * DAY + i, 1, ["click", "view"][i % 2], 1.0)
        for i in range(40)
    ]
    _write_events(spark, tmp_path, rows)
    a = sorted(
        (r["day"], r["event_type"], r["noise_nano"], r["noisy_n"], r["true_n"])
        for r in dp_noisy_daily_counts(spark, str(tmp_path)).collect()
    )
    b = sorted(
        (r["day"], r["event_type"], r["noise_nano"], r["noisy_n"], r["true_n"])
        for r in dp_noisy_daily_counts(spark, str(tmp_path)).collect()
    )
    assert a == b  # seeded: a release is one fixed draw
    noises = {x[2] for x in a}
    assert len(noises) > 1  # per-group draws differ
    for day, et, nn, noisy, true in a:
        assert noisy == true + (abs(nn) // 1000000000) * (1 if nn >= 0 else -1)


def test_band_tuning_planted_monotone(spark, tmp_path):
    """An identical doc pair is a candidate under EVERY (b, r) split
    (all 16 components match); candidate counts shrink monotonically
    as r grows (stricter bands admit fewer of the population)."""
    from dbt_project_spark.queries_dedup import minhash_band_tuning

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [(1, dup, "en"), (2, dup, "en")]
    for i in range(3, 13):
        docs.append(
            (
                i,
                f"doc {i} unrelated words " + " ".join(f"w{i}x{j}" for j in range(12)),
                "en",
            )
        )
    _write(spark, tmp_path, "documents", docs, "doc_id bigint, text string, lang string")
    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in minhash_band_tuning(spark, str(tmp_path)).collect()
    }
    assert len(rows) == 5
    prev = None
    for b, r in [(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)]:
        n = rows[(b, r)]["n_candidates"]
        assert n >= 1  # the identical pair survives every config
        if prev is not None:
            assert n <= prev  # stricter r never admits more
        prev = n
