"""Planted-semantics tests for the r5s4 additions: the Naive Bayes
language classifier (perfectly separable vocabularies must produce a
diagonal confusion matrix) and the CCNet perplexity terciles (docs
made of a repeated common bigram must out-rank word-salad docs)."""


def _write_docs(spark, path, rows):
    """rows: (doc_id, text, lang)"""
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(path / "documents.parquet")
    )


def test_nb_lang_classifier_separable_vocab(spark, tmp_path):
    """Two languages with disjoint vocabularies, one held-out doc
    each (doc_id % 5 == 0): Naive Bayes must classify both test docs
    correctly — the confusion matrix is exactly diagonal."""
    from dbt_project_spark.queries_training import nb_lang_classifier

    rows = [
        # lang 'aa' — train ids 1, 2; test id 5
        (1, "alphaone alphatwo alphathree alphaone", "aa"),
        (2, "alphatwo alphafour alphaone alphafive", "aa"),
        (5, "alphaone alphathree alphafive", "aa"),
        # lang 'bb' — train ids 3, 4; test id 10
        (3, "betaone betatwo betathree betaone betaone", "bb"),
        (4, "betafour betatwo betafive betaone", "bb"),
        (10, "betatwo betathree betafour", "bb"),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in nb_lang_classifier(spark, str(tmp_path)).collect()
    }
    assert out == {("aa", "aa"): 1, ("bb", "bb"): 1}


def test_ccnet_perplexity_buckets_ranking(spark, tmp_path):
    """One language, three docs of a single repeated bigram (high
    LM probability) and three unique word-salad docs (every bigram
    unseen elsewhere): terciles must be 2/2/2 with the repeated docs
    at the head, salad at the tail, and head scores strictly above
    tail scores."""
    from dbt_project_spark.queries_corpus import ccnet_perplexity_buckets

    salad = [
        "qqa wwb eec rrd tte yyf",
        "uug iih ooj ppk aal ssm",
        "ddn ffo ggp hhq jjr kks",
    ]
    rows = [(i, "xx xx xx xx xx xx xx", "en") for i in range(3)] + [
        (10 + i, s, "en") for i, s in enumerate(salad)
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r["bucket"]: r
        for r in ccnet_perplexity_buckets(spark, str(tmp_path)).collect()
    }
    assert {b: out[b]["n_docs"] for b in out} == {
        "head": 2,
        "middle": 2,
        "tail": 2,
    }
    # all three repeated docs share one (high) score; the salads one
    # (low) score: head = {high,high}, middle = {high,low}, tail = low
    assert out["head"]["min_score_micro"] == out["head"]["max_score_micro"]
    assert out["middle"]["max_score_micro"] == out["head"]["max_score_micro"]
    assert out["middle"]["min_score_micro"] == out["tail"]["min_score_micro"]
    assert out["head"]["min_score_micro"] > out["tail"]["max_score_micro"]


def _write_docs_src(spark, path, rows):
    """rows: (doc_id, text, lang, source)"""
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(path / "documents.parquet")
    )


def test_dsir_weights_target_lookalike(spark, tmp_path):
    """Docs of target-split tokens must out-weigh docs of
    raw-only tokens, and equal-content docs tie exactly."""
    from dbt_project_spark.queries_training import dsir_importance_weights

    rows = [
        (1, "tt tt tt tt", "en", "src1"),   # the target split
        (2, "rr rr rr rr", "en", "src0"),   # raw-only vocabulary
        (3, "tt tt tt tt", "en", "src0"),   # raw doc, target-like text
    ]
    _write_docs_src(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in dsir_importance_weights(spark, str(tmp_path)).collect()
    }
    assert all(out[d]["n_toks"] == 4 for d in (1, 2, 3))
    assert out[3]["weight_micro"] == out[1]["weight_micro"]
    assert out[3]["weight_micro"] > out[2]["weight_micro"]
    assert out[2]["keep"] == 0  # raw-only vocabulary: negative log-ratio


def test_moore_lewis_selects_target_like(spark, tmp_path):
    """Target LM = 'ga sa' bigrams; the raw background re-uses 'ga'
    followed by 'xx', so P_target(sa|ga) >> P_corpus(sa|ga): a raw
    doc written in target bigrams is kept, raw-only vocabulary is
    dropped with a strongly negative delta."""
    from dbt_project_spark.queries_training import moore_lewis_selection

    tgt = "ga sa ga sa ga sa"
    raw = "ga xx ga xx ga xx"
    rows = [
        (1, tgt, "en", "src1"),
        (2, tgt, "en", "src1"),
        (3, tgt, "en", "src1"),
        (4, raw, "en", "src0"),
        (6, raw, "en", "src0"),
        (7, raw, "en", "src0"),
        (8, "ga sa ga sa", "en", "src0"),  # target-like raw doc
        (9, "bb jj bb jj", "en", "src0"),  # unseen-in-target vocab
    ]
    _write_docs_src(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in moore_lewis_selection(spark, str(tmp_path)).collect()
    }
    assert out[8]["n_bigrams"] == 3
    assert out[8]["keep"] == 1 and out[8]["delta_micro"] > 0
    assert out[9]["keep"] == 0 and out[9]["delta_micro"] < 0
    assert out[8]["delta_micro"] > out[9]["delta_micro"]


def test_embedding_dim_drift_planted_shift(spark, tmp_path):
    """Even ids mean (2.0, 2.0); odd ids mean (1.0, 0.5): shifts are
    exactly -1.0 and -1.5 in micro units."""
    from dbt_project_spark.queries_vectors import embedding_dim_drift

    rows = [
        (0, [1.0, 2.0]),
        (2, [3.0, 2.0]),
        (1, [2.0, 0.5]),
        (3, [0.0, 0.5]),
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {
        r["dim"]: r for r in embedding_dim_drift(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_ref"] == 2 and out[1]["n_cur"] == 2
    assert out[1]["mean_ref_micro"] == 2_000_000
    assert out[1]["mean_cur_micro"] == 1_000_000
    assert out[1]["shift_micro"] == -1_000_000
    assert out[2]["mean_ref_micro"] == 2_000_000
    assert out[2]["mean_cur_micro"] == 500_000
    assert out[2]["shift_micro"] == -1_500_000


def test_exact_substr_shift_invariance(spark, tmp_path):
    """A 10-token passage copied into two docs at DIFFERENT offsets
    is fully detected in both (the fixed-grid span_dedup would miss
    the shifted copy); an all-unique doc reports zero."""
    from dbt_project_spark.queries_dedup import exact_substr_spans

    p = " ".join(f"p{i}" for i in range(1, 11))
    rows = [
        (1, p + " ua ub uc", "en", "src0"),
        (2, "zz " + p + " vd ve", "en", "src0"),
        (3, " ".join(f"q{i}" for i in range(1, 14)), "en", "src0"),
    ]
    _write_docs_src(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in exact_substr_spans(spark, str(tmp_path)).collect()
    }
    assert all(out[d]["n_tokens"] == 13 for d in (1, 2, 3))
    assert out[1]["n_spans"] == 1 and out[1]["dup_tokens"] == 10
    assert out[2]["n_spans"] == 1 and out[2]["dup_tokens"] == 10
    assert out[1]["dup_micro"] == 10 * 1_000_000 // 13
    assert out[3]["n_spans"] == 0 and out[3]["dup_tokens"] == 0


def test_bm25_ndcg_perfect_ranking(spark, tmp_path):
    """Three identical docs carry all query terms, the rest none:
    BM25 must put exactly the relevant docs on top in ideal order →
    nDCG = 1.0 with 3 relevant in the top k."""
    from dbt_project_spark.queries_retrieval import bm25_ndcg_eval

    rows = [(i, "dup vector merge pad%d" % i, "en", "src0") for i in (1, 2, 3)]
    rows += [
        (10 + i, "aa bb cc dd ee ff gg hh", "en", "src0") for i in range(9)
    ]
    _write_docs_src(spark, tmp_path, rows)
    r = bm25_ndcg_eval(spark, str(tmp_path)).collect()[0]
    assert r["n_rel_at_k"] == 3
    assert r["dcg9"] == r["idcg9"]
    assert r["ndcg"] == 1.0


DAY = 86400
T0 = 1_700_000_000 - (1_700_000_000 % DAY)


def _write_events(spark, path, rows):
    """rows: (event_id, ts_epoch_s, user_id, event_type, value)"""
    from pyspark.sql import functions as F

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
    df.coalesce(1).write.mode("overwrite").parquet(
        str(path / "events.parquet")
    )


def test_bootstrap_ci_degenerate_on_constant_values(spark, tmp_path):
    """All values equal → every resample mean is that value → the CI
    collapses onto the point estimate exactly."""
    from dbt_project_spark.queries_quality import bootstrap_mean_ci

    rows = [(i, T0 + i, 1, "click", 7.0) for i in range(40)]
    _write_events(spark, tmp_path, rows)
    r = bootstrap_mean_ci(spark, str(tmp_path)).collect()[0]
    assert r["n_events"] == 40 and r["n_resamples"] == 200
    assert r["mean_micro"] == 7_000_000
    assert r["ci_lo_micro"] == 7_000_000
    assert r["ci_hi_micro"] == 7_000_000


def test_bootstrap_ci_brackets_mean(spark, tmp_path):
    """Mixed values: CI must bracket the point estimate with
    ci_lo < mean < ci_hi strictly (non-degenerate spread)."""
    from dbt_project_spark.queries_quality import bootstrap_mean_ci

    rows = [(i, T0 + i, 1, "click", float(1 + (i % 10))) for i in range(60)]
    _write_events(spark, tmp_path, rows)
    r = bootstrap_mean_ci(spark, str(tmp_path)).collect()[0]
    assert r["ci_lo_micro"] < r["mean_micro"] < r["ci_hi_micro"]
