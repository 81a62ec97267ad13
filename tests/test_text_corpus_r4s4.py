"""Planted-semantics tests for the r4s4 text/corpus additions:
PMI against a hand-built co-occurrence, an exact-Zipf frequency
profile, a counted-by-hand Flesch score, and hashlib-replicated
weighted sampling priorities."""

import hashlib
import math


def _write_docs(spark, path, texts):
    rows = [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(path / "documents.parquet")
    )


def _toks(text):
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def test_collocation_pmi_planted(spark, tmp_path):
    """'north pole' occurs 6×; filler words dilute everything else —
    the top collocation must be (north, pole) with the exact pipeline
    PMI."""
    from dbt_project_spark.queries_corpus import collocation_pmi

    # filler bigrams are all distinct within a doc -> support 3 < 5,
    # so only (north, pole) clears the min-support filter
    texts = ["north pole north pole north pole"] * 2 + [
        "aa bb cc dd ee ff gg hh ii jj"
    ] * 3
    _write_docs(spark, tmp_path, texts)
    out = collocation_pmi(spark, str(tmp_path)).collect()
    top = out[0]
    assert (top["w1"], top["w2"]) == ("north", "pole")
    # replicate: bigram/unigram counts over the corpus
    bigs, unis = {}, {}
    for t in texts:
        ws = _toks(t)
        for w in ws:
            unis[w] = unis.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bigs[(a, b)] = bigs.get((a, b), 0) + 1
    np = sum(bigs.values())
    wt = sum(unis.values())
    c12 = bigs[("north", "pole")]
    pmi9 = round(
        math.log((c12 * wt * wt) / (np * unis["north"] * unis["pole"])) * 1e9
    )
    exp_micro = -((-pmi9) // 1000) if pmi9 < 0 else pmi9 // 1000
    assert top["n_pair"] == c12 == 6
    assert top["pmi_micro"] == exp_micro


def test_zipf_vocab_fit_exact_zipf(spark, tmp_path):
    """freq ∝ 1/rank exactly → fitted slope ≈ −1."""
    from dbt_project_spark.queries_corpus import zipf_vocab_fit

    words = {"aa": 120, "bb": 60, "cc": 40, "dd": 30, "ee": 24}
    text = " ".join(w for w, n in words.items() for _ in range(n))
    _write_docs(spark, tmp_path, [text])
    row = zipf_vocab_fit(spark, str(tmp_path)).collect()[0]
    assert row["n_words"] == 5
    slope = int(row["zipf_num"]) / int(row["zipf_den"])
    assert abs(slope + 1.0) < 0.02


def test_text_readability_counted_by_hand(spark, tmp_path):
    from dbt_project_spark.queries_text import text_readability

    _write_docs(spark, tmp_path, ["The cat sat. The dog ran!"])
    r = text_readability(spark, str(tmp_path)).collect()[0]
    assert r["n_words"] == 6
    assert r["n_sentences"] == 2
    assert r["n_syllables"] == 6  # e, a, a, e, o, a — one group per word
    # 206.835 - 1.015*(6/2) - 84.6*(6/6), all divisions exact
    assert r["flesch_micro"] == 206_835_000 - 1_015_000 * 3 - 84_600_000


def test_priority_sample_hashlib_replication(spark, tmp_path):
    """10 docs, K=100 ⇒ all selected; priorities must equal the
    hashlib/python replication bit-for-bit, and a heavyweight doc must
    outrank (smaller priority than) its unweighted twin."""
    from dbt_project_spark.queries_training import priority_sample_weighted

    texts = ["word " * (i + 1) for i in range(10)]
    _write_docs(spark, tmp_path, texts)
    out = priority_sample_weighted(spark, str(tmp_path)).collect()
    assert len(out) == 10
    exp = {}
    for i, t in enumerate(texts):
        w = max(len(_toks(t)), 1)
        u = int(hashlib.md5(f"psw|{i}".encode()).hexdigest()[:8], 16)
        exp[i] = (w, u * 1_000_000 // w)
    for r in out:
        ew, ep = exp[r["doc_id"]]
        assert (r["weight"], r["priority"]) == (ew, ep)
    # ordering is ascending by priority
    ps = [r["priority"] for r in out]
    assert ps == sorted(ps)


def test_heaps_law_on_repeating_vs_fresh_vocab(spark, tmp_path):
    """All-identical docs → vocabulary saturates after doc 1 → slope
    near 0; all-fresh vocab per doc → V grows ∝ N → slope near 1."""
    from dbt_project_spark.queries_corpus import heaps_law_fit

    _write_docs(spark, tmp_path, ["alpha beta gamma delta"] * 8)
    r = heaps_law_fit(spark, str(tmp_path)).collect()[0]
    beta = int(r["heaps_num"]) / int(r["heaps_den"])
    assert r["n_points"] == 8
    assert beta < 0.1

    fresh = [
        " ".join(f"w{d}x{i}" for i in range(5)) for d in range(8)
    ]
    _write_docs(spark, tmp_path, fresh)
    r2 = heaps_law_fit(spark, str(tmp_path)).collect()[0]
    beta2 = int(r2["heaps_num"]) / int(r2["heaps_den"])
    assert beta2 > 0.95


def test_rapid_repeat_orders_same_day_pairing(spark, tmp_path):
    from pyspark.sql import functions as F
    from dbt_project_spark.queries_pipeline import rapid_repeat_orders

    DAY = 86400
    T0 = 1_700_000_000 - (1_700_000_000 % DAY)
    rows = [
        (1, 1, 0, 10.00), (2, 1, 0, 10.00),  # exact double-submit
        (3, 1, 1, 10.00),                     # next day: not paired
        (4, 2, 0, 5.00), (5, 2, 0, 7.50),     # same day, diff amount
        (6, 3, 0, 1.00),                      # singleton
    ]
    spark.createDataFrame(
        [(k, c, "O", v, float(T0 + d * DAY + k), "1-URGENT")
         for k, c, d, v in rows],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, __ep double, o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.timestamp_seconds(F.col("__ep")).alias("o_orderdate"),
        "o_orderpriority",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {(r["key_a"], r["key_b"]): r
           for r in rapid_repeat_orders(spark, str(tmp_path)).collect()}
    assert set(out) == {(1, 2), (4, 5)}
    assert out[(1, 2)]["exact_amount_match"] is True
    assert out[(1, 2)]["amount_diff_cents"] == 0
    assert out[(4, 5)]["exact_amount_match"] is False
    assert out[(4, 5)]["amount_diff_cents"] == 250


def test_bpe_train_merges_planted(spark, tmp_path):
    """Hand-computed 4-merge chain on {aaab×2, aab×1}: (a,a) n=5 →
    (a,b) n=2 (tie with 'aa a' broken lexicographically — ' ' < 'a')
    → (aa,ab) n=2 → (aa,b) n=1; rounds 5-6 find no pairs and emit
    nothing (the LEFT JOIN no-op path)."""
    from dbt_project_spark.queries_corpus import bpe_train_merges

    _write_docs(spark, tmp_path, ["aaab aaab aab"])
    rows = sorted(
        bpe_train_merges(spark, str(tmp_path)).collect(),
        key=lambda r: r["merge_no"],
    )
    got = [
        (r["merge_no"], r["pair_left"], r["pair_right"], r["merged"], r["n"])
        for r in rows
    ]
    assert got == [
        (1, "a", "a", "aa", 5),
        (2, "a", "b", "ab", 2),
        (3, "aa", "ab", "aaab", 2),
        (4, "aa", "b", "aab", 1),
    ]


def test_bpe_tokenize_stats_planted(spark, tmp_path):
    """Same corpus as the merge test: after 4 effective merges both
    words collapse to single tokens — 11 weighted chars over 3
    corpus tokens."""
    from dbt_project_spark.queries_corpus import bpe_tokenize_stats

    _write_docs(spark, tmp_path, ["aaab aaab aab"])
    r = bpe_tokenize_stats(spark, str(tmp_path)).collect()[0]
    assert r["n_vocab_words"] == 2
    assert r["n_corpus_words"] == 3
    assert r["n_chars"] == 2 * 4 + 1 * 3
    assert r["n_tokens"] == 3
    assert r["chars_per_token_micro"] == 11 * 1_000_000 // 3
