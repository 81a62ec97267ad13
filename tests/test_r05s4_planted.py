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
