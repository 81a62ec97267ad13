"""Planted-corpus tests for the corpus-curation catalog family (r06
lint burn-down, final batch): hash-driven sampling/sharding/mixing
replicated in plain Python, keep-list and group-aware split over known
duplicate families, the novelty curve over known bigram first-sights,
the BPE fertility/packing surfaces on a merge-free single-letter
corpus, and the selection composite verified against its own member
queries plus the majority-vote invariant.
"""

import hashlib
import os
import re

import pytest

from pyspark.sql import functions as F

from dbt_project_spark.catalog import QUERIES, load_all

load_all()


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(t: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", t.lower())


# --- mixed-source corpus: 10 short docs (2 langs, source "small"),
# --- 10 long docs (1500 tokens each, source "big")
MIX_DOCS = {}
for i in range(10):
    MIX_DOCS[i] = (
        " ".join(f"s{i}w{j}" for j in range(10 + i)),
        "en" if i % 2 == 0 else "es",
        "small",
    )
for i in range(10, 20):
    MIX_DOCS[i] = (
        " ".join(f"b{i}w{j}" for j in range(1500)),
        "en",
        "big",
    )


@pytest.fixture(scope="module")
def mix_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus_mix") / "mixsf")
    rows = [(i, t, lang, src, len(t)) for i, (t, lang, src) in MIX_DOCS.items()]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_corpus_sample_stratified_planted(spark, mix_dir):
    want = {}
    for i, (t, lang, _) in MIX_DOCS.items():
        bucket = _md5i(t) % 100
        if (lang == "en" and bucket < 50) or (lang != "en" and bucket < 80):
            n, lo, hi = want.get(lang, (0, i, i))
            want[lang] = (n + 1, min(lo, i), max(hi, i))
    got = {r["lang"]: (r["n_kept"], r["min_doc"], r["max_doc"]) for r in
           QUERIES["corpus_sample_stratified"](spark, mix_dir).collect()}
    assert got == want and want  # the planted corpus keeps something


def test_corpus_shard_shuffle_planted(spark, mix_dir):
    by_shard = {}
    for i in MIX_DOCS:
        h = _md5i(str(i))
        by_shard.setdefault(h % 8, []).append((h, i))
    want = {}
    for shard, docs in by_shard.items():
        for pos, (_, i) in enumerate(sorted(docs), start=1):
            want[i] = (shard, pos)
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in
           QUERIES["corpus_shard_shuffle"](spark, mix_dir).collect()}
    assert got == want


def test_corpus_mix_sample_planted(spark, mix_dir):
    avail = {}
    for i, (t, _, src) in MIX_DOCS.items():
        avail[src] = avail.get(src, 0) + len(_toks(t))
    n_sources = len(avail)
    target = 20_000 // n_sources
    want = {}
    for src, av in avail.items():
        thr = 10_000 if target >= av else target * 10_000 // av
        kept_docs = kept_toks = 0
        for i, (t, _, s) in MIX_DOCS.items():
            if s == src and _md5i(t) % 10_000 < thr:
                kept_docs += 1
                kept_toks += len(_toks(t))
        want[src] = (av, target, kept_docs, kept_toks)
    got = {r["source"]: (r["avail_tokens"], r["target_tokens"],
                         r["n_docs_kept"], r["kept_tokens"]) for r in
           QUERIES["corpus_mix_sample"](spark, mix_dir).collect()}
    assert got == want
    # the big source overflows its allocation → partial hash keep
    assert want["big"][0] > want["big"][1]
    assert want["small"][0] <= want["small"][1]  # fully kept


def test_corpus_novelty_curve_planted(spark, mix_dir):
    n_docs = len(MIX_DOCS)
    firsts, rows = {}, []
    for i in sorted(MIX_DOCS):
        toks = _toks(MIX_DOCS[i][0])
        for a, b in zip(toks, toks[1:]):
            g = f"{a} {b}"
            firsts.setdefault(g, i)
            rows.append((i, g))
    want = {}
    for i, g in rows:
        bucket = min(i * 10 // n_docs, 9)
        nb, nn = want.get(bucket, (0, 0))
        want[bucket] = (nb + 1, nn + (1 if firsts[g] == i else 0))
    want = {b: (nb, nn, nn * 1_000_000 // nb) for b, (nb, nn) in want.items()}
    got = {r["bucket"]: (r["n_bigrams"], r["n_new"], r["novelty_micro"])
           for r in QUERIES["corpus_novelty_curve"](spark, mix_dir).collect()}
    assert got == want


def test_corpus_selection_composite_planted(spark, mix_dir):
    # compositional contract: the composite's member columns equal the
    # member queries' own outputs, and the vote arithmetic holds
    comp = {r["doc_id"]: r for r in
            QUERIES["corpus_selection_composite"](spark, mix_dir).collect()}
    dsir = {r["doc_id"]: (r["n_toks"], r["keep"]) for r in
            QUERIES["dsir_importance_weights"](spark, mix_dir).collect()}
    ml = {r["doc_id"]: r["keep"] for r in
          QUERIES["moore_lewis_selection"](spark, mix_dir).collect()}
    assert set(comp) == set(dsir) & set(ml)
    for i, r in comp.items():
        assert (r["n_toks"], r["dsir_keep"]) == dsir[i]
        assert r["ml_keep"] == ml[i]
        assert r["len_ok"] == (1 if 20 <= r["n_toks"] <= 100_000 else 0)
        votes = r["dsir_keep"] + r["ml_keep"] + r["len_ok"]
        assert r["selected"] == (1 if votes >= 2 else 0)
    # the planted corpus exercises both length-vote outcomes
    assert {r["len_ok"] for r in comp.values()} == {0, 1}


# --- duplicate-family corpus (same families as test_dedup_planted)
TX = "alpha beta gamma delta epsilon zeta"
TY = "oak pine birch maple cedar willow"
DUP_DOCS = [
    (1, TX), (2, TX), (3, TX), (10, TX),
    (4, TY), (5, TY), (20, TY),
    (6, "one two three four five six"),
    (7, "cat dog fox wolf bear lynx"),
]
CLUSTER = {1: 1, 2: 1, 3: 1, 10: 1, 4: 4, 5: 4, 20: 4, 6: 6, 7: 7}


@pytest.fixture(scope="module")
def dup_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus_dup") / "dupsf")
    rows = [(i, t, "en", "plant", len(t)) for i, t in DUP_DOCS]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_corpus_keep_list_planted(spark, dup_dir):
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in
           QUERIES["corpus_keep_list"](spark, dup_dir).collect()}
    want = {i: (c, c == i) for i, c in CLUSTER.items()}
    assert got == want
    assert sum(1 for _, k in got.values() if k) == 4  # 1, 4, 6, 7


def test_split_group_aware_planted(spark, dup_dir):
    split_of = {
        i: ("train" if _md5i(str(c)) % 10 < 8 else "val")
        for i, c in CLUSTER.items()
    }
    want = {}
    for i, t in DUP_DOCS:
        s = split_of[i]
        n, toks, clusters = want.get(s, (0, 0, set()))
        want[s] = (n + 1, toks + len(_toks(t)), clusters | {CLUSTER[i]})
    rows = QUERIES["split_group_aware"](spark, dup_dir).collect()
    got = {r["split"]: (r["n_docs"], r["n_tokens"], r["n_clusters"],
                        r["leak_pairs"]) for r in rows}
    assert got == {s: (n, t, len(c), 0) for s, (n, t, c) in want.items()}
    # whole families land on one side: no near-dup pair straddles
    assert all(r["leak_pairs"] == 0 for r in rows)


# --- merge-free BPE corpus: single-letter words, so segmentation is
# --- the identity and fertility/packing arithmetic pins exactly
@pytest.fixture(scope="module")
def bpe_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus_bpe") / "bpesf")
    rows = [
        (1, " ".join(["a"] * 300), "en", "plant", 599),
        (2, " ".join(["b"] * 300), "es", "plant", 599),
        (3, " ".join(["c"] * 50), "de", "plant", 99),
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_bpe_fertility_by_lang_planted(spark, bpe_dir):
    got = {r["lang"]: (r["n_words"], r["n_chars"], r["n_tokens"],
                       r["tokens_per_word_micro"], r["chars_per_token_micro"])
           for r in QUERIES["bpe_fertility_by_lang"](spark, bpe_dir).collect()}
    m = 1_000_000
    assert got == {
        "en": (300, 300, 300, m, m),
        "es": (300, 300, 300, m, m),
        "de": (50, 50, 50, m, m),
    }


def test_bpe_pack_budget_planted(spark, bpe_dir):
    # budget 512: doc1 [0,300) chunk 0; doc2 [300,600) spans the 512
    # boundary; doc3 [600,650) chunk 1
    got = {r["doc_id"]: (r["n_tokens"], r["token_offset"], r["first_chunk"],
                         r["last_chunk"], r["n_chunks"]) for r in
           QUERIES["bpe_pack_budget"](spark, bpe_dir).collect()}
    assert got == {
        1: (300, 0, 0, 0, 1),
        2: (300, 300, 0, 1, 2),
        3: (50, 600, 1, 1, 1),
    }


def test_negative_sampling_dist_planted(spark, mix_dir):
    # python replica of the word2vec noise table: f^0.75 in rounded
    # micro units, exact integer probabilities, total (fp6 desc, word)
    # order
    freq = {}
    for t, _, _ in MIX_DOCS.values():
        for w in _toks(t):
            freq[w] = freq.get(w, 0) + 1
    fp6 = {w: round(f ** 0.75 * 1_000_000) for w, f in freq.items()}
    tot = sum(fp6.values())
    order = sorted(freq, key=lambda w: (-fp6[w], w))
    cum = 0
    want = {}
    for rk, w in enumerate(order[:20], start=1):
        cum += fp6[w]
        want[rk] = (w, freq[w], fp6[w], fp6[w] * 1_000_000 // tot,
                    cum * 1_000_000 // tot)
    got = {r["rank"]: (r["word"], r["f"], r["fp6"], r["p_micro"],
                       r["cum_p_micro"]) for r in
           QUERIES["negative_sampling_dist"](spark, mix_dir).collect()}
    assert got == want


def test_vocab_coverage_curve_planted(spark, mix_dir):
    freq = {}
    for t, _, _ in MIX_DOCS.values():
        for w in _toks(t):
            freq[w] = freq.get(w, 0) + 1
    order = sorted(freq, key=lambda w: (-freq[w], w))
    tot = sum(freq.values())
    want = {}
    for v in (50, 100, 200, 500):
        c = sum(freq[w] for w in order[:v])
        want[v] = (tot, c, c * 1_000_000 // tot)
    got = {r["vocab_size"]: (r["n_tokens_total"], r["n_covered"],
                             r["coverage_micro"]) for r in
           QUERIES["vocab_coverage_curve"](spark, mix_dir).collect()}
    assert got == want
    # the planted corpus has >500 distinct tokens, so the curve is
    # strictly increasing and never saturates at 100%
    assert len(freq) > 500
    covs = [want[v][2] for v in (50, 100, 200, 500)]
    assert covs == sorted(covs) and covs[-1] < 1_000_000
