"""Planted-semantics tests for the r5s6 additions: ANOVA separation
and null cases, Jarque-Bera symmetric-distribution zeros, Spearman
perfect monotone/antitone ranks, l-diversity homogeneous-class
detection, lead-lag cross-correlation shift recovery, and the PCA
power iteration recovering a planted principal axis exactly."""

from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [(int(e), ts, int(u), t, float(v), "{}") for e, ts, u, t, v in rows],
        "event_id bigint, __ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("__ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(path / "events.parquet"))


def _write_embeddings(spark, path, rows):
    """rows: (vec_id, [float components])"""
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(path / "embeddings.parquet")
    )


def test_anova_separated_groups(spark, tmp_path):
    """Two groups with means 1.00 vs 100.00 and tiny within-group
    spread: nearly all variance is between-group."""
    from dbt_project_spark.queries_quality import anova_oneway

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.00),
        (2, "2024-01-01 01:00:00", 1, "view", 1.02),
        (3, "2024-01-01 02:00:00", 2, "purchase", 100.00),
        (4, "2024-01-01 03:00:00", 2, "purchase", 100.02),
    ]
    _write_events(spark, tmp_path, rows)
    r = anova_oneway(spark, str(tmp_path)).collect()[0]
    assert r["n_groups"] == 2 and r["n_total"] == 4
    assert r["eta2_micro"] >= 999000
    assert r["f_stat"] > 1000


def test_anova_identical_groups_zero_between(spark, tmp_path):
    """Identical value multisets per group: SSB is exactly zero (the
    truncating x1000 fixed point cannot manufacture spread)."""
    from dbt_project_spark.queries_quality import anova_oneway

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 3.00),
        (2, "2024-01-01 01:00:00", 1, "view", 7.00),
        (3, "2024-01-01 02:00:00", 2, "purchase", 3.00),
        (4, "2024-01-01 03:00:00", 2, "purchase", 7.00),
    ]
    _write_events(spark, tmp_path, rows)
    r = anova_oneway(spark, str(tmp_path)).collect()[0]
    assert r["ssb_milli"] == 0
    assert r["eta2_micro"] == 0
    assert r["f_stat"] == 0.0


def test_jarque_bera_symmetric_three_point(spark, tmp_path):
    """Values {1.00, 2.00, 3.00}: m3 = 0 exactly (skewness 0) and
    kurtosis = m4/m2^2 = 1.5 for the symmetric 3-point uniform."""
    from dbt_project_spark.queries_quality import jarque_bera_value

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.00),
        (2, "2024-01-01 01:00:00", 1, "view", 2.00),
        (3, "2024-01-01 02:00:00", 1, "view", 3.00),
    ]
    _write_events(spark, tmp_path, rows)
    r = jarque_bera_value(spark, str(tmp_path)).collect()[0]
    assert r["skewness"] == 0.0
    assert r["kurtosis"] == 1.5
    # JB = n/6 * (0 + (1.5-3)^2/4) = 0.5 * 0.5625 = 0.28125
    assert r["jb_stat"] == 0.28125


def test_spearman_perfect_monotone_and_antitone(spark, tmp_path):
    """Count rank == total rank -> rho_micro = 1e6; perfectly
    reversed ranks -> rho_micro = -1e6."""
    from dbt_project_spark.queries_quality import spearman_user_value

    mono = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.00),
        (2, "2024-01-01 01:00:00", 2, "view", 1.00),
        (3, "2024-01-01 02:00:00", 2, "view", 1.00),
        (4, "2024-01-01 03:00:00", 3, "view", 1.00),
        (5, "2024-01-01 04:00:00", 3, "view", 1.00),
        (6, "2024-01-01 05:00:00", 3, "view", 1.00),
    ]
    _write_events(spark, tmp_path, mono)
    r = spearman_user_value(spark, str(tmp_path)).collect()[0]
    assert r["n_users"] == 3 and r["sum_d2"] == 0
    assert r["rho_micro"] == 1000000

    anti = [
        (1, "2024-01-01 00:00:00", 1, "view", 9.00),
        (2, "2024-01-01 01:00:00", 2, "view", 2.00),
        (3, "2024-01-01 02:00:00", 2, "view", 2.00),
        (4, "2024-01-01 03:00:00", 3, "view", 0.50),
        (5, "2024-01-01 04:00:00", 3, "view", 0.50),
        (6, "2024-01-01 05:00:00", 3, "view", 0.50),
    ]
    _write_events(spark, tmp_path, anti)
    r = spearman_user_value(spark, str(tmp_path)).collect()[0]
    assert r["sum_d2"] == 8
    assert r["rho_micro"] == -1000000


def test_l_diversity_homogeneous_class_flagged(spark, tmp_path):
    """Day 1 is all-purchase (l=1, full disclosure); day 2 mixes two
    types (l=2). Both days fall below the l=3 floor."""
    from dbt_project_spark.queries_governance import l_diversity_audit

    rows = [
        (1, "2024-01-01 00:00:00", 1, "purchase", 1.00),
        (2, "2024-01-01 01:00:00", 2, "purchase", 1.00),
        (3, "2024-01-02 00:00:00", 1, "purchase", 1.00),
        (4, "2024-01-02 01:00:00", 2, "view", 1.00),
    ]
    _write_events(spark, tmp_path, rows)
    r = l_diversity_audit(spark, str(tmp_path)).collect()[0]
    assert r["n_classes"] == 2 and r["n_rows"] == 4
    assert r["l_min"] == 1
    assert r["classes_l1"] == 1 and r["rows_l1"] == 2
    assert r["classes_lt_l"] == 2 and r["rows_lt_l"] == 4
    assert r["risky_micro"] == 1000000


def test_xcorr_recovers_planted_shift(spark, tmp_path):
    """Purchase counts are the error counts shifted one day later:
    r = 1.0 exactly at lag +1 and below 1 at lag 0."""
    from dbt_project_spark.queries_timeseries import xcorr_lead_lag

    rows, eid = [], 0
    for day, cnt in ((1, 1), (2, 2), (3, 3)):
        for k in range(cnt):
            eid += 1
            rows.append(
                (eid, f"2024-01-0{day} 0{k}:00:00", 1, "error", 1.00)
            )
    for day, cnt in ((2, 1), (3, 2), (4, 3)):
        for k in range(cnt):
            eid += 1
            rows.append(
                (eid, f"2024-01-0{day} 1{k}:00:00", 1, "purchase", 1.00)
            )
    _write_events(spark, tmp_path, rows)
    r = {x["lag"]: x for x in xcorr_lead_lag(spark, str(tmp_path)).collect()}
    assert r[1]["r"] == 1.0 and r[1]["n"] == 3
    assert r[0]["r"] < 1.0


def test_pca_recovers_planted_axis(spark, tmp_path):
    """Vectors varying only along dim 0: the top eigenvector is
    exactly e0 (v_micro = +-1e6 at dim 0, 0 elsewhere) and the last
    two iterates align exactly."""
    from dbt_project_spark.queries_vectors import embedding_pca_power

    _write_embeddings(
        spark,
        tmp_path,
        [(1, [0.25, 0.0, 0.0, 0.0]), (2, [0.5, 0.0, 0.0, 0.0]),
         (3, [1.0, 0.0, 0.0, 0.0])],
    )
    rows = {x["dim"]: x for x in
            embedding_pca_power(spark, str(tmp_path)).collect()}
    assert abs(rows[0]["v_micro"]) == 1000000
    for d in (1, 2, 3):
        assert rows[d]["v_micro"] == 0
    assert rows[0]["align"] == 1.0
    assert rows[0]["lambda_scaled"] > 0


def _docs(spark, path, rows):
    spark.createDataFrame(
        [(int(i), t, "en", "src0", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(path / "documents.parquet")
    )


def _write_orders(spark, path, rows):
    """rows: (o_orderkey, o_orderdate_str)"""
    spark.createDataFrame(
        [(int(k), 1, "O", 1.0, d, "1-URGENT") for k, d in rows],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, __d string, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("__d").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(path / "orders.parquet")
    )


def _write_lineitem(spark, path, rows):
    """rows: (l_orderkey, l_linenumber, l_shipdate_str)"""
    spark.createDataFrame(
        [
            (int(k), 1, 1, int(ln), 1.0, 1.0, 0.0, 0.0, "N", "O", d)
            for k, ln, d in rows
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, __d string",
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        F.col("__d").cast("timestamp").alias("l_shipdate"),
    ).coalesce(1).write.mode("overwrite").parquet(
        str(path / "lineitem.parquet")
    )


def test_quantile_drift_qq_planted_shift(spark, tmp_path):
    """Reference half all 1.00, current half all 2.00: every decile
    shifts by exactly 100 cents."""
    from dbt_project_spark.queries_quality import quantile_drift_qq

    rows = [
        (i, f"2024-01-01 0{i}:00:00", 1, "view", 1.00) for i in range(4)
    ] + [
        (10 + i, f"2024-01-01 2{i}:00:00", 1, "view", 2.00)
        for i in range(4)
    ]
    _write_events(spark, tmp_path, rows)
    out = quantile_drift_qq(spark, str(tmp_path)).collect()
    assert len(out) == 9
    for r in out:
        assert r["ref_v100"] == 100
        assert r["cur_v100"] == 200
        assert r["shift_cents"] == 100


def test_order_backlog_open_close(spark, tmp_path):
    """Two overlapping orders: backlog peaks at 2 in January, drops to
    1 after the first order's last shipment, to 0 after the second."""
    from dbt_project_spark.queries_retail import order_backlog_series

    _write_orders(
        spark, tmp_path, [(1, "2024-01-05 00:00:00"), (2, "2024-01-10 00:00:00")]
    )
    _write_lineitem(
        spark,
        tmp_path,
        [
            (1, 1, "2024-01-12 00:00:00"),
            (1, 2, "2024-01-20 00:00:00"),
            (2, 1, "2024-02-10 00:00:00"),
        ],
    )
    out = {r["month"]: r for r in
           order_backlog_series(spark, str(tmp_path)).collect()}
    assert out["2024-01"]["peak_open"] == 2
    # last January event is the -1 on Jan 21 (close of order 1)
    assert out["2024-01"]["eom_open"] == 1
    assert out["2024-02"]["peak_open"] == 0
    assert out["2024-02"]["eom_open"] == 0


def test_pca_explained_variance_rank_one(spark, tmp_path):
    """A rank-one corpus (variance only along dim 0): the leading
    direction captures exactly 100% of the variance."""
    from dbt_project_spark.queries_vectors import pca_explained_variance

    _write_embeddings(
        spark,
        tmp_path,
        [(1, [0.25, 0.0, 0.0, 0.0]), (2, [0.5, 0.0, 0.0, 0.0]),
         (3, [1.0, 0.0, 0.0, 0.0])],
    )
    r = pca_explained_variance(spark, str(tmp_path)).collect()[0]
    assert r["n_vecs"] == 3 and r["dim"] == 4
    assert r["explained_micro"] == 1000000


def test_prf_surfaces_doc_without_seed_terms(spark, tmp_path):
    """Feedback docs share the distinctive term 'zebrafish'; a doc
    rich in it but containing NO seed term enters the expanded
    ranking flagged is_new=1."""
    from dbt_project_spark.queries_retrieval import query_expansion_prf

    rows = [
        (i, "dup vector merge zebrafish zebrafish zebrafish filler" + str(i))
        for i in range(1, 11)
    ]
    rows.append((100, "zebrafish zebrafish zebrafish zebrafish zebrafish"))
    rows += [(200 + i, f"plain text number{i} nothing relevant") for i in range(10)]
    _docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in
           query_expansion_prf(spark, str(tmp_path)).collect()}
    assert 100 in out
    assert out[100]["is_new"] == 1
    # the seed-term docs stay in the list and are not new
    assert out[1]["is_new"] == 0


def test_pii_density_progressive_counting(spark, tmp_path):
    """An email inside a URL is redacted as the URL and NOT counted
    again as an email; standalone email/phone/ipv4 each count once;
    a clean doc keeps docs_with_pii honest."""
    from dbt_project_spark.queries_governance import pii_density_report

    _docs(
        spark,
        tmp_path,
        [
            (1, "visit https://x.example/a@b.com?q=1 today"),
            (2, "mail a@b.com or call 415-555-1234 from 10.0.0.1"),
            (3, "perfectly clean document with no identifiers"),
        ],
    )
    r = {x["source"]: x for x in
         pii_density_report(spark, str(tmp_path)).collect()}["src0"]
    assert r["n_docs"] == 3
    assert r["docs_with_pii"] == 2
    assert r["url_matches"] == 1
    assert r["email_matches"] == 1  # only doc 2's; doc 1's is in the URL
    assert r["ipv4_matches"] == 1
    assert r["phone_matches"] == 1
    assert r["pii_per_mchar"] > 0


def test_kfold_exact_balance_two_strata(spark, tmp_path):
    """Two strata of 5 docs each, K=5: round-robin dealing gives every
    fold exactly one doc per stratum — dev_micro is 0 everywhere."""
    from dbt_project_spark.queries_training import (
        KFOLD_K,
        stratified_kfold_assignment,
    )

    rows = [(i, f"word{i} text", "en", "src0", 10) for i in range(5)]
    rows += [(10 + i, f"mot{i} texte", "fr", "src1", 10) for i in range(5)]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = stratified_kfold_assignment(spark, str(tmp_path)).collect()
    assert len(out) == KFOLD_K
    for r in out:
        assert r["n_docs"] == 2
        assert r["n_strata"] == 2
        assert r["dev_micro"] == 0


def test_degree_powerlaw_star_slope_minus_one(spark, tmp_path):
    """Star graph (hub degree 3, three leaves of degree 1): the
    two-point log-log fit has slope exactly -1 (gamma_num = -gamma_den
    as exact integers)."""
    from dbt_project_spark.queries_graph import degree_powerlaw_fit

    _write_lineitem(
        spark,
        tmp_path,
        [
            (1, 1, "2024-01-01 00:00:00"),
            (1, 2, "2024-01-01 00:00:00"),
            (2, 1, "2024-01-02 00:00:00"),
            (2, 2, "2024-01-02 00:00:00"),
            (3, 1, "2024-01-03 00:00:00"),
            (3, 2, "2024-01-03 00:00:00"),
        ],
    )
    # orders 1,2,3 each pair part 1 with parts 2,3,4 -> rewrite partkeys
    import pyspark.sql.functions as SF

    li = spark.read.parquet(str(tmp_path / "lineitem.parquet"))
    li = li.withColumn(
        "l_partkey",
        SF.when(SF.col("l_linenumber") == 1, 1).otherwise(
            SF.col("l_orderkey") + 1
        ),
    )
    li.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem2.parquet")
    )
    import shutil

    shutil.rmtree(str(tmp_path / "lineitem.parquet"))
    shutil.move(
        str(tmp_path / "lineitem2.parquet"),
        str(tmp_path / "lineitem.parquet"),
    )
    r = degree_powerlaw_fit(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 3
    assert r["n_points"] == 2
    assert r["min_degree"] == 1 and r["max_degree"] == 3
    assert int(r["gamma_num"]) == -int(r["gamma_den"])


def test_lorenz_deciles_exact_shares(spark, tmp_path):
    """10 users spending 1..10 dollars: one user per decile, shares
    are the exact truncating micro ratios, cumulative ends at 1e6."""
    from dbt_project_spark.queries_quality import lorenz_curve_deciles

    rows = [
        (i, f"2024-01-01 {i:02d}:00:00", i, "purchase", float(i))
        for i in range(1, 11)
    ]
    _write_events(spark, tmp_path, rows)
    out = sorted(
        lorenz_curve_deciles(spark, str(tmp_path)).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in out] == list(range(1, 11))
    grand = sum(i * 100 for i in range(1, 11))
    for k, r in enumerate(out, start=1):
        assert r["n_users"] == 1
        assert r["share_micro"] == k * 100 * 10**6 // grand
    assert out[-1]["cum_share_micro"] == 1000000


def test_weibull_fit_planted_increasing_hazard(spark, tmp_path):
    """Three staggered churn times with one censored survivor: the
    ln(-ln S) vs ln t fit sees 3 points and a positive slope."""
    from dbt_project_spark.queries_ops import weibull_survival_fit

    rows, eid = [], 0
    # users 1..3 churn with last events on days 1,2,3; user 4 survives
    # to the observation end (day 10)
    for u, last in ((1, 1), (2, 2), (3, 3), (4, 10)):
        for day in (0, last):
            eid += 1
            rows.append(
                (eid, f"2024-01-{day + 1:02d} 00:00:00", u, "view", 1.00)
            )
    _write_events(spark, tmp_path, rows)
    r = weibull_survival_fit(spark, str(tmp_path)).collect()[0]
    assert r["n_points"] == 3
    assert r["min_t"] == 1 and r["max_t"] == 3
    assert int(r["shape_num"]) > 0 and int(r["shape_den"]) > 0


def test_overdispersion_constant_vs_clumped(spark, tmp_path):
    """A constant daily series has dispersion exactly 0; a clumped
    one (0,0,6) has Var/Mean exactly 6 — and the zero days come from
    the shared day spine, not from stored rows."""
    from dbt_project_spark.queries_ops import count_overdispersion

    rows, eid = [], 0
    for day in (1, 2, 3):
        for _ in range(2):
            eid += 1
            rows.append(
                (eid, f"2024-01-0{day} 0{eid % 10}:00:00", 1, "view", 1.00)
            )
    for _ in range(6):
        eid += 1
        rows.append(
            (eid, f"2024-01-03 1{eid % 10}:00:00", 1, "error", 1.00)
        )
    _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in
           count_overdispersion(spark, str(tmp_path)).collect()}
    assert out["view"]["n_days"] == 3
    assert out["view"]["dispersion_micro"] == 0
    assert out["view"]["overdispersed"] == 0
    assert out["error"]["mean_micro"] == 2000000
    assert out["error"]["dispersion_micro"] == 6000000
    assert out["error"]["overdispersed"] == 1


def test_hash_uniformity_invariants(spark, tmp_path):
    """Bucket counts partition the users; the chi2 stat is
    non-negative and the verdict is a strict function of it."""
    from dbt_project_spark.queries_governance import (
        HU_K,
        hash_uniformity_audit,
    )

    rows = [
        (i, f"2024-01-01 {i % 24:02d}:00:00", i, "view", 1.00)
        for i in range(1, 161)
    ]
    _write_events(spark, tmp_path, rows)
    r = hash_uniformity_audit(spark, str(tmp_path)).collect()[0]
    assert r["n_users"] == 160 and r["k"] == HU_K
    assert r["chi2_micro"] >= 0
    assert r["min_bucket"] * HU_K <= 160 <= r["max_bucket"] * HU_K
    assert r["uniform_ok"] in (0, 1)


def test_pca_outliers_flag_planted_extreme(spark, tmp_path):
    """Five clustered vectors plus one far along the same axis: the
    extreme vector ranks first by PC1 deviation."""
    from dbt_project_spark.queries_vectors import embedding_pca_outliers

    vecs = [(i, [0.2, 0.0, 0.0, 0.0]) for i in range(1, 6)]
    vecs.append((6, [1.0, 0.0, 0.0, 0.0]))
    _write_embeddings(spark, tmp_path, vecs)
    out = sorted(
        embedding_pca_outliers(spark, str(tmp_path)).collect(),
        key=lambda r: r["rank"],
    )
    assert out[0]["vec_id"] == 6
    assert out[0]["dev"] > out[1]["dev"]
    assert len(out) == 6


def test_dft_spectrum_concentrates_at_fundamental(spark, tmp_path):
    """A quantized one-cycle-per-week cosine over 14 complete days
    puts (almost) all its power in the f=1 bin."""
    from dbt_project_spark.queries_timeseries import (
        _COS6,
        dft_power_spectrum,
    )

    rows = []
    for i in range(14):
        # epoch day of 2024-01-01 + i; value encodes 30000 + cos6[d%7]
        # cents exactly (two-decimal dollars)
        import datetime

        day = datetime.date(2024, 1, 1) + datetime.timedelta(days=i)
        epoch_day = (day - datetime.date(1970, 1, 1)).days
        v100 = 3000000 + _COS6[epoch_day % 7]
        rows.append(
            (i + 1, f"{day} 00:00:00", 1, "view", v100 / 100.0)
        )
    _write_events(spark, tmp_path, rows)
    out = {r["f"]: r for r in
           dft_power_spectrum(spark, str(tmp_path)).collect()}
    p1, p2, p3 = (int(out[f]["power"]) for f in (1, 2, 3))
    assert out[1]["n_days"] == 14
    assert p1 > 100 * p2 and p1 > 100 * p3


def test_vocab_drift_identical_and_disjoint(spark, tmp_path):
    """Same vocabulary in both halves -> Jaccard exactly 1e6;
    disjoint vocabularies -> 0 with full only-counts."""
    from dbt_project_spark.queries_corpus import vocab_drift_halves

    same = [(i, "alpha beta gamma delta") for i in range(1, 9)]
    _docs(spark, tmp_path, same)
    r = vocab_drift_halves(spark, str(tmp_path)).collect()[0]
    assert r["jaccard_micro"] == 1000000
    assert r["only_a"] == 0 and r["only_b"] == 0
    assert r["vocab_a"] == 4 and r["vocab_b"] == 4

    disj = [(2 * i, "alpha beta") for i in range(1, 5)]
    disj += [(2 * i + 1, "gamma delta") for i in range(1, 5)]
    _docs(spark, tmp_path, disj)
    r = vocab_drift_halves(spark, str(tmp_path)).collect()[0]
    assert r["jaccard_micro"] == 0
    assert r["n_common"] == 0
    assert r["only_a"] == 2 and r["only_b"] == 2


def test_ngram_entropy_deterministic_and_ln2(spark, tmp_path):
    """A strictly alternating corpus has conditional entropy exactly
    0; a 50/50 branching successor gives exactly round(ln 2 * 1e9)/1
    nano-nats."""
    from dbt_project_spark.queries_corpus import ngram_entropy_rate

    _docs(spark, tmp_path, [(1, "a b a b a b"), (2, "a b a b")])
    r = ngram_entropy_rate(spark, str(tmp_path)).collect()[0]
    assert r["h_cond_nano"] == 0

    _docs(spark, tmp_path, [(1, "aa bb"), (2, "aa cc")])
    r = ngram_entropy_rate(spark, str(tmp_path)).collect()[0]
    assert r["n_bigrams"] == 2 and r["n_distinct"] == 2
    assert r["h_cond_nano"] == 693147181


def test_kappa_perfect_and_chance_agreement(spark, tmp_path):
    """Filters engineered to agree on every doc give kappa exactly
    1e6; a doc set where A passes everything and B rejects everything
    pins the degenerate chance-floor case to 0."""
    from dbt_project_spark.queries_corpus import filter_agreement_kappa

    stop_rich = "the a of and to in is that " + " ".join(
        f"word{i:02d}" for i in range(50)
    )
    # fa: >=2 stopwords and 4/5 alphabetic -- passes; fb: 50..100000
    # words with mean len 3..10 -- passes (58 words, lens ~3)
    good = [(i, stop_rich) for i in range(1, 5)]
    # both filters fail: no stopwords, 3 numeric-heavy short tokens
    bad = [(10 + i, "11111 22222 33333") for i in range(1, 5)]
    _docs(spark, tmp_path, good + bad)
    r = filter_agreement_kappa(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 8
    assert r["n11"] == 4 and r["n00"] == 4
    assert r["agree_micro"] == 1000000
    assert r["kappa_micro"] == 1000000

    # A always passes, B always fails: agreement 0, kappa 0 (pe = po)
    only_a = [(i, "the a of and to " + " ".join("x" * 3 for _ in range(3)))
              for i in range(1, 5)]
    _docs(spark, tmp_path, only_a)
    r = filter_agreement_kappa(spark, str(tmp_path)).collect()[0]
    assert r["n10"] == 4 and r["n11"] == 0
    assert r["agree_micro"] == 0
    assert r["kappa_micro"] == 0


def test_fulfillment_latency_exact_order_stats(spark, tmp_path):
    """Latencies {1,2,3,10} for one priority: p50 is the smallest day
    with 2*cum >= n (=2), p90 the smallest with 10*cum >= 9n (=10)."""
    from dbt_project_spark.queries_retail import (
        fulfillment_latency_by_priority,
    )

    _write_orders(
        spark,
        tmp_path,
        [(k, "2024-01-01 00:00:00") for k in (1, 2, 3, 4)],
    )
    _write_lineitem(
        spark,
        tmp_path,
        [
            (1, 1, "2024-01-02 00:00:00"),
            (2, 1, "2024-01-03 00:00:00"),
            (3, 1, "2024-01-04 00:00:00"),
            (4, 1, "2024-01-11 00:00:00"),
            (4, 2, "2024-01-20 00:00:00"),  # later ship must not matter
        ],
    )
    r = fulfillment_latency_by_priority(spark, str(tmp_path)).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_orders"] == 4
    assert row["p50_days"] == 2
    assert row["p90_days"] == 10
    assert row["max_days"] == 10


def test_markov_stationary_two_state(spark, tmp_path):
    """A strictly alternating two-state chain has stationary
    distribution (1/2, 1/2) exactly at the x1e6 scale."""
    from dbt_project_spark.queries_product import markov_stationary_mix

    rows, eid = [], 0
    for k in range(8):
        eid += 1
        rows.append(
            (
                eid,
                f"2024-01-01 {k:02d}:00:00",
                1,
                "view" if k % 2 == 0 else "purchase",
                1.00,
            )
        )
    _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in
           markov_stationary_mix(spark, str(tmp_path)).collect()}
    assert out["view"]["pi_micro"] == 500000
    assert out["purchase"]["pi_micro"] == 500000


def test_sprt_crosses_upper_on_all_converters(spark, tmp_path):
    """Every user converts: the per-arm LLR climbs ln(1.2) per user
    and crosses +ln 19 after ceil(2.944/0.182) = 17 users."""
    from dbt_project_spark.queries_product import ab_sequential_wald

    rows, eid = [], 0
    # 40 users, each with one 4000.00-dollar event (converts), each
    # enrolling on their own day
    for u in range(1, 41):
        eid += 1
        rows.append((eid, f"2024-{1 + (u - 1) // 28:02d}-{1 + (u - 1) % 28:02d} 00:00:00", u, "purchase", 4000.00))
    _write_events(spark, tmp_path, rows)
    out = {r["arm"]: r for r in
           ab_sequential_wald(spark, str(tmp_path)).collect()}
    for arm in ("A", "B"):
        assert out[arm]["decision"] == "accept_h1"
        assert out[arm]["cross_day"] >= 0
        assert out[arm]["final_llr9"] > 0


def test_source_surprisal_flags_divergent_source(spark, tmp_path):
    """A source whose bigrams are rare in the pool carries higher
    cross-entropy than one matching the pool."""
    from dbt_project_spark.queries_corpus import source_lm_surprisal

    rows = [(i, "alpha beta", "en", "srcA", 10) for i in range(1, 9)]
    rows += [(10 + i, "alpha gamma", "en", "srcA", 11) for i in range(1, 9)]
    # srcB's successor of 'alpha' is rare in the pool (1 of 17)
    rows.append((100, "alpha delta", "en", "srcB", 11))
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r["source"]: r for r in
           source_lm_surprisal(spark, str(tmp_path)).collect()}
    assert out["srcB"]["h_nano"] > out["srcA"]["h_nano"]
    assert out["srcB"]["delta_vs_corpus_nano"] > 0
    assert out["srcA"]["delta_vs_corpus_nano"] <= 0


def test_linreg_two_factor_exact_plane(spark, tmp_path):
    """Values generated exactly on the plane y = 500 + 100*hour +
    700*weekend (cents): Cramer recovers all three coefficients to
    the exact micro integers."""
    from dbt_project_spark.queries_product import linreg_two_factor

    rows, eid = [], 0
    # 2024-01-06 is a Saturday (epoch day % 7 == 2), 2024-01-08 Monday
    for day, wk in (("2024-01-06", 1), ("2024-01-08", 0)):
        for h in (0, 3, 7, 12, 21):
            eid += 1
            v100 = 500 + 100 * h + 700 * wk
            rows.append((eid, f"{day} {h:02d}:00:00", 1, "view", v100 / 100.0))
    _write_events(spark, tmp_path, rows)
    r = linreg_two_factor(spark, str(tmp_path)).collect()[0]
    assert r["n_events"] == 10
    assert r["b0_micro"] == 500 * 1000000
    assert r["b1_micro"] == 100 * 1000000
    assert r["b2_micro"] == 700 * 1000000


def test_holdout_perplexity_unseen_and_uniform(spark, tmp_path):
    """A test doc repeating the train corpus's only bigram scores
    ln((c+1)/(ctx+V)) exactly; a fully unseen test bigram is flagged
    and scored at the smoothed floor."""
    from dbt_project_spark.queries_corpus import holdout_perplexity_bigram

    # train docs (doc_id 1,2): "aa bb" twice -> c(aa,bb)=2, ctx(aa)=2, V=1
    # test doc (doc_id 5): "aa bb aa" -> bigrams (aa,bb) seen, (bb,aa) unseen
    _docs(spark, tmp_path, [(1, "aa bb"), (2, "aa bb"), (5, "aa bb aa")])
    r = holdout_perplexity_bigram(spark, str(tmp_path)).collect()[0]
    assert r["n_test_bigrams"] == 2
    assert r["n_unseen"] == 1
    assert r["oov_micro"] == 500000
    # terms: seen (aa,bb): ln(3/3)=0; unseen (bb,aa): ln(1/1)=0
    # (ctx(bb)=0, V=1) -> H = 0 exactly
    assert r["h_nano"] == 0


def test_knn_langid_separable_clusters(spark, tmp_path):
    """Embeddings clustered by language along different axes: every
    held-out vector's 5 nearest neighbors share its language, so the
    confusion matrix is diagonal."""
    from dbt_project_spark.queries_similarity import knn_langid_eval

    rows, vecs = [], []
    for i in range(20):
        vid = i + 1
        if vid % 2 == 0:
            lang, vec = "en", [1.0, 0.01 * i, 0.0, 0.0]
        else:
            lang, vec = "fr", [0.0, 0.0, 1.0, 0.01 * i]
        rows.append((vid, f"text {vid}", lang, "src0", 8))
        vecs.append((vid, vec))
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    _write_embeddings(spark, tmp_path, vecs)
    out = knn_langid_eval(spark, str(tmp_path)).collect()
    for r in out:
        assert r["true_lang"] == r["pred_lang"]
    assert sum(r["n_docs"] for r in out) == 4  # vec_id in {5,10,15,20}


def test_cross_batch_straddle_detection(spark, tmp_path):
    """A near-dup pair planted across the parity halves is counted as
    cross; an identical-text pair within one half is not."""
    from dbt_project_spark.queries_dedup import dedup_cross_batch

    base = " ".join(f"tok{i:03d}" for i in range(40))
    _docs(
        spark,
        tmp_path,
        [
            (2, base),                      # even
            (3, base + " tail0"),           # odd  -> cross pair (2,3)
            (4, "B " + base),               # even -> cross with 3? no:
                                            # shares shingles with 2 too
            (101, "unique one " + "x " * 30),
            (103, "another singleton " + "y " * 30),
        ],
    )
    r = dedup_cross_batch(spark, str(tmp_path)).collect()[0]
    assert r["n_pairs"] >= 1
    assert r["cross_pairs"] >= 1
    assert (
        r["within_even"] + r["within_odd"] + r["cross_pairs"]
        == r["n_pairs"]
    )
    assert 0 <= r["cross_micro"] <= 1000000


def test_simhash_sweep_identical_docs_radius_zero(spark, tmp_path):
    """Identical documents produce identical signatures: the pair
    lands at radius 0 and in every cumulative bucket; counts are
    monotone in the radius."""
    from dbt_project_spark.queries_dedup import simhash_radius_sweep

    base = " ".join(f"word{i:03d}" for i in range(30))
    _docs(spark, tmp_path, [(1, base), (2, base), (3, "totally different "
                                                      "content here")])
    out = {r["radius"]: r for r in
           simhash_radius_sweep(spark, str(tmp_path)).collect()}
    assert out[0]["n_at"] >= 1
    prev = -1
    for rr in range(4):
        assert out[rr]["n_within"] >= out[rr]["n_at"] - (
            0 if rr == 0 else 0
        )
        assert out[rr]["n_within"] >= prev
        prev = out[rr]["n_within"]


def test_gumbel_constant_maxima_degenerate(spark, tmp_path):
    """Identical daily maxima: sigma is exactly 0, so mu equals the
    mean and the 1-in-365 return level collapses onto it."""
    from dbt_project_spark.queries_timeseries import gumbel_block_maxima

    rows, eid = [], 0
    for day in (1, 2, 3, 4):
        for v in (1.00, 5.00):  # max 500 cents every day
            eid += 1
            rows.append(
                (eid, f"2024-01-0{day} 0{eid % 10}:00:00", 1, "view", v)
            )
    _write_events(spark, tmp_path, rows)
    r = gumbel_block_maxima(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 4
    assert r["mean100"] == 500.0
    assert r["sigma100"] == 0.0
    assert r["mu100"] == 500.0
    assert r["return_level_365_100"] == 500.0


def test_conversion_window_sweep_monotone(spark, tmp_path):
    """Three signups converting after 30min / 10h / never: the sweep
    counts 1 at 1h, 2 at 24h and 72h; rates are exact micro."""
    from dbt_project_spark.queries_product import (
        conversion_window_sensitivity,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, "signup", 1.00),
        (2, "2024-01-01 00:30:00", 1, "purchase", 5.00),
        (3, "2024-01-01 00:00:00", 2, "signup", 1.00),
        (4, "2024-01-01 10:00:00", 2, "purchase", 5.00),
        (5, "2024-01-01 00:00:00", 3, "signup", 1.00),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["window_hours"]: r for r in
           conversion_window_sensitivity(spark, str(tmp_path)).collect()}
    assert out[1]["n_converted"] == 1
    assert out[6]["n_converted"] == 1
    assert out[24]["n_converted"] == 2
    assert out[72]["n_converted"] == 2
    assert out[1]["conv_micro"] == 333333
    assert out[24]["conv_micro"] == 666666
    assert all(out[h]["n_signup"] == 3 for h in (1, 6, 24, 72))


def test_bm25_sensitivity_baseline_self_overlap(spark, tmp_path):
    """The baseline variant's overlap with itself equals its own list
    size; every overlap is bounded by it."""
    from dbt_project_spark.queries_retrieval import bm25_param_sensitivity

    _docs(
        spark,
        tmp_path,
        [(1, "dup vector merge alpha"), (2, "dup dup vector beta"),
         (3, "merge gamma delta"), (4, "nothing relevant here")],
    )
    out = {r["variant"]: r for r in
           bm25_param_sensitivity(spark, str(tmp_path)).collect()}
    base = out["k1_1.2_b_0.75"]
    assert base["overlap_with_base"] == 3  # docs 1,2,3 score > 0
    for r in out.values():
        assert 0 <= r["overlap_with_base"] <= base["overlap_with_base"]


def test_centroid_separation_orthogonal_langs(spark, tmp_path):
    """Two languages planted on orthogonal axes: centroid cosine is
    exactly 0."""
    from dbt_project_spark.queries_vectors import (
        embedding_centroid_separation,
    )

    rows, vecs = [], []
    for i in range(1, 5):
        rows.append((i, f"t{i}", "en", "s", 2))
        vecs.append((i, [0.5, 0.0, 0.0, 0.0]))
    for i in range(5, 9):
        rows.append((i, f"t{i}", "fr", "s", 2))
        vecs.append((i, [0.0, 0.5, 0.0, 0.0]))
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    _write_embeddings(spark, tmp_path, vecs)
    r = embedding_centroid_separation(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert r[0]["centroid_cosine"] == 0.0


def test_runs_test_single_source_pins_ratio(spark, tmp_path):
    """A single-source corpus makes every adjacency a same-source
    pair: observed equals expected exactly (clump_micro = 1e6) in
    every shard with >= 2 docs."""
    from dbt_project_spark.queries_training import (
        shard_interleave_runs_test,
    )

    _docs(spark, tmp_path, [(i, f"doc number {i}") for i in range(1, 41)])
    out = shard_interleave_runs_test(spark, str(tmp_path)).collect()
    for r in out:
        if r["n_docs"] >= 2:
            assert r["same_adj"] == r["n_docs"] - 1
            assert r["clump_micro"] == 1000000


def test_weekend_odds_exact_two_by_two(spark, tmp_path):
    """Planted 3/1/1/3 table: OR = 9/1 as exact strings and a CI that
    brackets ln 9."""
    from dbt_project_spark.queries_product import weekend_conversion_odds

    rows, eid = [], 0
    # 2024-01-06 = Saturday (exposed); 2024-01-08 = Monday
    for u in (1, 2, 3):  # exposed converters
        eid += 1
        rows.append((eid, "2024-01-06 01:00:00", u, "purchase", 4000.00))
    eid += 1
    rows.append((eid, "2024-01-06 02:00:00", 4, "view", 1.00))  # exp, not
    eid += 1
    rows.append((eid, "2024-01-08 01:00:00", 5, "purchase", 4000.00))
    for u in (6, 7, 8):  # unexposed non-converters
        eid += 1
        rows.append((eid, "2024-01-08 02:00:00", u, "view", 1.00))
    _write_events(spark, tmp_path, rows)
    r = weekend_conversion_odds(spark, str(tmp_path)).collect()[0]
    assert (r["n_exp_conv"], r["n_exp_not"]) == (3, 1)
    assert (r["n_unexp_conv"], r["n_unexp_not"]) == (1, 3)
    assert r["or_num"] == "9" and r["or_den"] == "1"
    import math

    assert r["ln_or_lo95"] < math.log(9) < r["ln_or_hi95"]


def test_pair_transitivity_clique_and_vacuous(spark, tmp_path):
    """Three identical docs form a closed triangle (closure exactly
    1e6); an all-distinct corpus is vacuously transitive."""
    from dbt_project_spark.queries_dedup import dedup_pair_transitivity

    base = " ".join(f"tok{i:03d}" for i in range(40))
    _docs(spark, tmp_path, [(1, base), (2, base), (3, base)])
    r = dedup_pair_transitivity(spark, str(tmp_path)).collect()[0]
    assert r["n_pairs"] == 3
    assert r["n_wedges"] == 3 and r["n_closed"] == 3
    assert r["closure_micro"] == 1000000

    _docs(spark, tmp_path, [
        (1, " ".join(f"aa{i}" for i in range(20))),
        (2, " ".join(f"bb{i}" for i in range(20))),
    ])
    r = dedup_pair_transitivity(spark, str(tmp_path)).collect()[0]
    assert r["n_pairs"] == 0 and r["closure_micro"] == 1000000


def test_ingest_gap_islands_exact(spark, tmp_path):
    """Hours {0,1,2, 5,6, 10} of one day: two gaps (3-4 and 7-9),
    5 missing hours, longest 3 starting at hour 7."""
    from dbt_project_spark.queries_ops import ingest_gap_report

    rows = []
    for i, hr in enumerate((0, 1, 2, 5, 6, 10)):
        rows.append((i + 1, f"2024-01-01 {hr:02d}:30:00", 1, "view", 1.00))
    _write_events(spark, tmp_path, rows)
    r = ingest_gap_report(spark, str(tmp_path)).collect()[0]
    assert r["n_hours_present"] == 6
    assert r["n_hours_span"] == 11
    assert r["n_hours_missing"] == 5
    assert r["n_gaps"] == 2
    assert r["longest_gap_hours"] == 3
    # epoch hour of 2024-01-01 07:00 UTC
    import datetime

    h7 = int(datetime.datetime(2024, 1, 1, 7,
                               tzinfo=datetime.timezone.utc).timestamp()
             // 3600)
    assert r["longest_gap_start_hr"] == h7


def test_negbin_fit_exact_and_null_verdict(spark, tmp_path):
    """Clumped counts (0,0,6): r = m^2/(v-m) = 4/4... exact rational
    strings; a constant series emits the Poisson-is-fine NULLs."""
    from dbt_project_spark.queries_ops import negbin_moment_fit

    rows, eid = [], 0
    for day in (1, 2, 3):
        for _ in range(2):
            eid += 1
            rows.append(
                (eid, f"2024-01-0{day} 0{eid % 10}:00:00", 1, "view", 1.00)
            )
    for _ in range(6):
        eid += 1
        rows.append((eid, f"2024-01-03 1{eid % 10}:00:00", 1, "error", 1.00))
    _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in
           negbin_moment_fit(spark, str(tmp_path)).collect()}
    # error: n=3, s=6, q=36 -> r = s^2(n-1)/(n(vnum-vden)) with
    # vnum = 108-36 = 72, vden = 12 -> r = 36*2/(3*60) = 72/180
    assert out["error"]["r_num"] == "72"
    assert out["error"]["r_den"] == "180"
    assert out["error"]["p_micro"] == 12 * 1000000 // 72
    assert out["view"]["r_num"] is None
    assert out["view"]["p_micro"] is None


def test_capture_recapture_exact_estimate(spark, tmp_path):
    """4 users in half one, 3 in half two, 2 in both: N-hat = 4*3//2
    = 6 with 5 seen -> unseen share 200000 micro."""
    from dbt_project_spark.queries_analytics import capture_recapture_users

    rows, eid = [], 0
    # half boundary: events span 00:00..10:00, mid = 05:00
    for u in (1, 2, 3, 4):  # captured in first half
        eid += 1
        rows.append((eid, f"2024-01-01 0{u - 1}:00:00", u, "view", 1.00))
    for u in (1, 2, 5):  # captured in second half (1,2 recaptured)
        eid += 1
        rows.append((eid, "2024-01-01 09:00:00", u, "view", 1.00))
    eid += 1
    rows.append((eid, "2024-01-01 10:00:00", 5, "view", 1.00))
    _write_events(spark, tmp_path, rows)
    r = capture_recapture_users(spark, str(tmp_path)).collect()[0]
    assert (r["n1"], r["n2"], r["m12"], r["n_seen"]) == (4, 3, 2, 5)
    assert r["n_hat"] == 6
    assert r["unseen_share_micro"] == 200000


def test_good_turing_hapax_mass(spark, tmp_path):
    """A corpus of 4 singletons and one word seen twice: P0 = 4/6
    and the r=1 discount ratio (r+1)N2/(rN1) = 2*1/4."""
    from dbt_project_spark.queries_corpus import good_turing_unseen_mass

    _docs(spark, tmp_path, [(1, "aa bb cc"), (2, "dd ee ee")])
    out = {r["r"]: r for r in
           good_turing_unseen_mass(spark, str(tmp_path)).collect()}
    assert out[1]["n_r"] == 4 and out[1]["n_r1"] == 1
    assert out[1]["p0_micro"] == 4 * 1000000 // 6
    assert out[1]["rstar_ratio_micro"] == 2 * 1 * 1000000 // 4
    assert out[2]["n_r"] == 1
    assert out[3]["n_r"] == 0 and out[3]["rstar_ratio_micro"] is None
    assert out[1]["n_tokens"] == 6 and out[1]["vocab"] == 5


def test_distinctive_terms_planted_marker(spark, tmp_path):
    """A marker word concentrated in one source tops that source's
    distinctive list; shared filler does not."""
    from dbt_project_spark.queries_corpus import source_distinctive_terms

    rows = []
    for i in range(1, 6):
        rows.append(
            (i, "common filler words everywhere " + "zyggurat " * 6,
             "en", "srcA", 60)
        )
    for i in range(6, 11):
        rows.append(
            (i, "common filler words everywhere plain", "en", "srcB", 40)
        )
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = source_distinctive_terms(spark, str(tmp_path)).collect()
    a_top = [r for r in out if r["source"] == "srcA" and r["rank"] == 1][0]
    assert a_top["term"] == "zyggurat"
    assert a_top["lo6"] > 0


def test_forecast_backtest_constant_series_full_coverage(spark, tmp_path):
    """A perfectly 7-periodic series has all-zero residuals: the band
    is [0, 0] and second-half coverage is exactly 1e6."""
    from dbt_project_spark.queries_timeseries import (
        forecast_backtest_coverage,
    )

    import datetime

    rows, eid = [], 0
    for i in range(28):
        day = datetime.date(2024, 1, 1) + datetime.timedelta(days=i)
        v = 10.00 + (i % 7)  # exact weekly pattern
        eid += 1
        rows.append((eid, f"{day} 00:00:00", 1, "view", v))
    _write_events(spark, tmp_path, rows)
    r = forecast_backtest_coverage(spark, str(tmp_path)).collect()[0]
    assert r["n_train"] + r["n_test"] == 21  # 28 days - 7 lag
    assert r["band_lo_cents"] == 0 and r["band_hi_cents"] == 0
    assert r["n_covered"] == r["n_test"]
    assert r["coverage_micro"] == 1000000


def test_delta_method_zero_variance_ratio(spark, tmp_path):
    """Every user has identical (spend, events): all variances and
    the covariance are zero, so the delta-method SE is exactly 0 and
    the ratio is exact."""
    from dbt_project_spark.queries_product import ratio_metric_delta_method

    rows, eid = [], 0
    for u in (1, 2, 3, 4):
        for k in range(2):  # 2 events of 3.00 each -> x=600, y=2
            eid += 1
            rows.append(
                (eid, f"2024-01-01 0{eid}:00:00", u, "view", 3.00)
            )
    _write_events(spark, tmp_path, rows)
    r = ratio_metric_delta_method(spark, str(tmp_path)).collect()[0]
    assert r["n_users"] == 4
    assert r["ratio_micro"] == 600 * 1000000 // 2
    assert r["se_delta"] == 0.0
    assert r["ratio_dbl"] == 300.0


def test_minhash_vs_exact_identical_docs(spark, tmp_path):
    """Identical docs: both pipelines find the same pair set —
    recall and precision exactly 1e6."""
    from dbt_project_spark.queries_dedup import minhash_vs_exact_recall

    base = " ".join(f"tok{i:03d}" for i in range(40))
    _docs(spark, tmp_path, [(1, base), (2, base),
                            (3, "something else entirely here today")])
    r = minhash_vs_exact_recall(spark, str(tmp_path)).collect()[0]
    assert r["n_exact"] == 1 and r["n_lsh"] == 1 and r["n_both"] == 1
    assert r["recall_micro"] == 1000000
    assert r["precision_micro"] == 1000000


def test_nb_mcc_bounds_and_accuracy_consistency(spark, tmp_path):
    """On a tiny separable corpus MCC is defined (or NULL on a
    degenerate margin) and accuracy matches the matrix trace."""
    from dbt_project_spark.queries_training import nb_mcc_score

    rows = []
    for i in range(1, 21):
        lang = "en" if i % 2 == 0 else "fr"
        text = ("hello world common words " if lang == "en"
                else "bonjour monde mots communs ") * 3
        rows.append((i, text, lang, "src0", len(text)))
    import pyspark.sql.functions as SF  # noqa: F401

    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    r = nb_mcc_score(spark, str(tmp_path)).collect()[0]
    assert r["n_test"] == 4  # doc_id % 5 == 0 -> 5,10,15,20
    assert 0 <= r["n_correct"] <= r["n_test"]
    assert r["accuracy_micro"] == r["n_correct"] * 1000000 // r["n_test"]
    if r["mcc"] is not None:
        assert -1.0 <= r["mcc"] <= 1.0


def test_variance_ratio_iid_steps(spark, tmp_path):
    """An exact alternating +1/-1 daily series is strongly mean
    reverting: VR(2) is far below 1 (2-day differences are zero)."""
    from dbt_project_spark.queries_timeseries import ts_variance_ratio

    import datetime

    rows = []
    for i in range(20):
        day = datetime.date(2024, 1, 1) + datetime.timedelta(days=i)
        v = 10.00 if i % 2 == 0 else 11.00
        rows.append((i + 1, f"{day} 00:00:00", 1, "view", v))
    _write_events(spark, tmp_path, rows)
    out = {r["q"]: r for r in
           ts_variance_ratio(spark, str(tmp_path)).collect()}
    assert out[1]["vr"] == 1.0
    assert out[2]["vr"] == 0.0  # 2-day diffs identically zero
    assert out[4]["vr"] == 0.0 and out[8]["vr"] == 0.0


def test_survivorship_duplicated_source_penalized(spark, tmp_path):
    """A source made of clones keeps one doc; a unique source keeps
    everything."""
    from dbt_project_spark.queries_corpus import (
        dedup_survivorship_by_source,
    )

    base = " ".join(f"tok{i:03d}" for i in range(40))
    rows = [(i, base, "en", "srcDup", len(base)) for i in range(1, 5)]
    rows += [
        (10 + i, f"unique text number {i} " + " ".join(
            f"w{i}{j}" for j in range(20)), "en", "srcUniq", 100)
        for i in range(1, 5)
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r["source"]: r for r in
           dedup_survivorship_by_source(spark, str(tmp_path)).collect()}
    assert out["srcDup"]["n_docs"] == 4 and out["srcDup"]["kept_docs"] == 1
    assert out["srcDup"]["doc_survival_micro"] == 250000
    assert out["srcUniq"]["kept_docs"] == 4
    assert out["srcUniq"]["doc_survival_micro"] == 1000000


def test_recency_auc_perfect_separation(spark, tmp_path):
    """Returners were seen just before the midpoint, churners long
    before: recency separates perfectly -> AUC exactly 1e6."""
    from dbt_project_spark.queries_product import recency_churn_auc

    rows, eid = [], 0
    # span 00:00 .. 20:00, midpoint 10:00
    eid += 1; rows.append((eid, "2024-01-01 00:00:00", 99, "view", 1.00))
    eid += 1; rows.append((eid, "2024-01-01 20:00:00", 98, "view", 1.00))
    # churners: last seen at 01:00 (huge recency), silent after mid
    for u in (1, 2):
        eid += 1
        rows.append((eid, "2024-01-01 01:00:00", u, "view", 1.00))
    # returners: seen at 09:00 (small recency) AND after the midpoint
    for u in (3, 4):
        eid += 1
        rows.append((eid, "2024-01-01 09:00:00", u, "view", 1.00))
        eid += 1
        rows.append((eid, "2024-01-01 12:00:00", u, "view", 1.00))
    _write_events(spark, tmp_path, rows)
    r = recency_churn_auc(spark, str(tmp_path)).collect()[0]
    # user 99 (00:00) churns, user 98 only after mid (excluded: no
    # pre-mid event? 98's event is at 20:00 -> last_before NULL)
    assert r["n_pos"] == 2 and r["n_neg"] == 3
    assert r["auc_micro"] == 1000000


def test_markov_reach_deterministic_chain(spark, tmp_path):
    """view -> purchase always: reach from 'view' is 1e6 at every
    horizon; from 'purchase' it is whatever purchase's successor
    distribution gives (here purchase -> view -> purchase: reach1 0,
    reach2 1e6)."""
    from dbt_project_spark.queries_product import markov_reach_purchase

    rows, eid = [], 0
    seq = ["view", "purchase"] * 6
    for i, t in enumerate(seq):
        eid += 1
        rows.append((eid, f"2024-01-01 {i:02d}:00:00", 1, t, 1.00))
    _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in
           markov_reach_purchase(spark, str(tmp_path)).collect()}
    assert out["view"]["reach1_micro"] == 1000000
    assert out["view"]["reach4_micro"] == 1000000
    assert out["purchase"]["reach1_micro"] == 0
    assert out["purchase"]["reach2_micro"] == 1000000


def test_hill_index_exact_pareto_ratios(spark, tmp_path):
    """A tail of doubled values over the threshold: every ln ratio is
    a known constant, so gamma is the exact integer mean of the two
    rounded ln terms."""
    from dbt_project_spark.queries_quality import (
        HILL_K,
        hill_tail_index,
    )

    # HILL_K = 100 needs 101 positive values; make the top three
    # 40.00, 20.00, 10.00 and the remaining 98 all 10.00 -> the
    # k+1-th value is 10.00 and only the top two contribute nonzero
    rows = [(1, "2024-01-01 00:00:00", 1, "view", 40.00),
            (2, "2024-01-01 00:01:00", 1, "view", 20.00)]
    for i in range(3, HILL_K + 2):
        rows.append((i, f"2024-01-01 {i % 24:02d}:{i % 60:02d}:00",
                     1, "view", 10.00))
    _write_events(spark, tmp_path, rows)
    r = hill_tail_index(spark, str(tmp_path)).collect()[0]
    assert r["k_tail"] == HILL_K
    assert r["threshold_v100"] == 1000
    import math

    ln4 = round(math.log(4.0) * 1e9)
    ln2 = round(math.log(2.0) * 1e9)
    assert r["hill_gamma_nano"] == (ln4 + ln2) // HILL_K
    assert r["alpha_hat"] is not None
