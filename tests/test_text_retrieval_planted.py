"""Planted-corpus tests for the text-analysis and retrieval catalog
families (r06 lint burn-down). One 10-doc corpus with paired
embeddings; every expectation below is replicated in plain Python
(regex tokenizer, md5 fingerprints, TF-IDF, RRF arithmetic) rather
than asserted from a recorded run.

Retrieval geometry: doc/vec 0 is the query; docs 1-3 carry the BM25
terms with strictly decreasing keyword evidence, docs 4-9 carry none
(score 0); embeddings give distinct cosines with docs 2 and 8
deliberately discordant between the lexical and vector rankers so the
RRF fusion and overlap@k numbers are non-trivial.
"""

import hashlib
import math
import os
import re
from decimal import ROUND_HALF_UP, Decimal

import pytest

from dbt_project_spark.catalog import QUERIES, load_all

load_all()

DOCS = {
    0: "qqq www eee rrr ttt",
    1: "dup vector merge dup extra1 extra2",
    2: "vector merge extra3 extra4 extra5 extra6",
    3: "merge extra7 extra8 extra9 extra10 extra11",
    4: "the cat and dog runs fast",
    5: "el gato que corre bien hoy",
    6: "der hund und die katze ist gross",
    7: "zz yy",
    8: ("apple banana cherry date elder fig grape honey iris jade kiwi "
        "lemon mango nut olive peach quince rose sage thyme umber violet "
        "wheat yam"),
    9: " ".join(f"w{i}" for i in range(150)),
}
LANGS = {4: "en", 5: "es", 6: "de"}
# cosine of each vec against query vec 0
COS = {1: 0.95, 2: 0.25, 3: 0.85, 4: 0.75, 5: 0.65, 6: 0.55, 7: 0.45,
       8: 0.35, 9: 0.15}


def _toks(text: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


def _r6(x: float) -> float:
    # Spark/DuckDB ROUND is HALF_UP; python round() is banker's
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


@pytest.fixture(scope="module")
def tr_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("text_retrieval") / "trsf")
    docs = [
        (i, t, LANGS.get(i, "en"), "plant", len(t)) for i, t in DOCS.items()
    ]
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    emb = [(0, [1.0] + [0.0] * 7, 0)]
    for k, c in COS.items():
        emb.append((k, [c, math.sqrt(1 - c * c)] + [0.0] * 6, 0))
    spark.createDataFrame(
        emb, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


def test_text_tokens_planted(spark, tr_dir):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_unique_tokens"], r["n_alnum_chars"])
        for r in QUERIES["text_tokens"](spark, tr_dir).collect()
    }
    want = {
        i: (len(_toks(t)), len(set(_toks(t))), sum(len(w) for w in _toks(t)))
        for i, t in DOCS.items()
    }
    assert got == want


def test_text_quality_planted(spark, tr_dir):
    stop = {"the", "a", "and", "of", "to", "in", "is",
            "el", "la", "de", "que", "y", "en", "un",
            "der", "die", "das", "und", "ist", "von", "mit"}
    got = {r["doc_id"]: r for r in
           QUERIES["text_quality"](spark, tr_dir).collect()}
    for i, t in DOCS.items():
        toks = _toks(t)
        n_stop = sum(1 for w in toks if w in stop)
        r = got[i]
        assert r["avg_token_len"] == sum(len(w) for w in toks) / len(toks)
        assert r["stopword_ratio"] == n_stop / len(toks)
        assert r["unique_ratio"] == len(set(toks)) / len(toks)
        want_q = (len(toks) >= 20 and n_stop / len(toks) < 0.5
                  and len(set(toks)) / len(toks) > 0.2)
        assert r["is_quality"] == want_q
    assert got[8]["is_quality"] is True  # the planted quality doc
    assert got[4]["is_quality"] is False  # too short


def test_text_langid_planted(spark, tr_dir):
    got = {r["doc_id"]: r for r in
           QUERIES["text_langid"](spark, tr_dir).collect()}
    assert (got[4]["en_hits"], got[4]["predicted_lang"]) == (2, "en")
    assert (got[5]["es_hits"], got[5]["predicted_lang"]) == (2, "es")
    # der, und, die, ist all hit the de profile
    assert (got[6]["de_hits"], got[6]["predicted_lang"]) == (4, "de")
    # zero hits everywhere ties toward en
    assert got[7]["predicted_lang"] == "en"
    assert got[0]["predicted_lang"] == "en"


def test_text_fingerprint_planted(spark, tr_dir):
    got = {r["doc_id"]: r for r in
           QUERIES["text_fingerprint"](spark, tr_dir).collect()}
    for i, t in DOCS.items():
        toks = _toks(t)
        bag = " ".join(sorted(set(toks)))
        want_fp = hashlib.md5(bag.encode()).hexdigest()[:16]
        assert got[i]["bag_fingerprint"] == want_fp
        sh = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
        if sh:
            want_min = min(
                int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh
            )
            assert got[i]["min_shingle_hash"] == want_min
        else:
            assert got[i]["min_shingle_hash"] is None  # doc 7: 2 tokens
    assert got[7]["min_shingle_hash"] is None


def test_text_chunking_planted(spark, tr_dir):
    got = {}
    for r in QUERIES["text_chunking"](spark, tr_dir).collect():
        got[(r["doc_id"], r["chunk_idx"])] = (r["chunk"], r["chunk_tokens"])
    want = {}
    for i, t in DOCS.items():
        toks = _toks(t)
        n_chunks = math.ceil(len(toks) / 64)
        for ci in range(n_chunks):
            piece = toks[ci * 64: ci * 64 + 96]
            want[(i, ci)] = (" ".join(piece), len(piece))
    assert got == want
    # the long doc really produced overlapping windows: 96 + 86 + 22
    assert [got[(9, c)][1] for c in range(3)] == [96, 86, 22]


def test_inverted_index_planted(spark, tr_dir):
    got = {r["term"]: (r["tf"], r["df"], r["min_doc"], r["max_doc"],
                       r["postings_head"])
           for r in QUERIES["inverted_index"](spark, tr_dir).collect()}
    tf, postings = {}, {}
    for i, t in DOCS.items():
        for w in _toks(t):
            tf[w] = tf.get(w, 0) + 1
            postings.setdefault(w, set()).add(i)
    want = {
        w: (tf[w], len(ds), min(ds), max(ds),
            ",".join(str(x) for x in sorted(ds)[:10]))
        for w, ds in postings.items()
    }
    assert got == want
    assert got["dup"][0] == 2 and got["dup"][1] == 1  # tf 2, df 1


def test_tfidf_top_terms_planted(spark, tr_dir):
    n = len(DOCS)
    tf, dfq = {}, {}
    for i, t in DOCS.items():
        for w in _toks(t):
            tf[(i, w)] = tf.get((i, w), 0) + 1
    for (_, w) in tf:
        dfq[w] = dfq.get(w, 0) + 1
    want = {}
    for i in DOCS:
        scored = sorted(
            ((w, _r6(c * _r6(math.log(n / dfq[w]))))
             for (d, w), c in tf.items() if d == i),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        want[i] = (",".join(w for w, _ in scored),
                   max(s for _, s in scored))
    got = {r["doc_id"]: (r["top_terms"], r["top_score"]) for r in
           QUERIES["tfidf_top_terms"](spark, tr_dir).collect()}
    assert got == want


# BM25 emits only docs containing ≥1 query term, so the lexical
# ranking is just the three keyword docs; the vector ranking covers
# all nine candidates with docs 2 and 8 discordant.
LEX_RANKS = {1: 1, 2: 2, 3: 3}
VEC_RANKS = {1: 1, 3: 2, 4: 3, 5: 4, 6: 5, 7: 6, 8: 7, 2: 8, 9: 9}


def test_bm25_topk_planted(spark, tr_dir):
    rows = sorted(QUERIES["bm25_topk"](spark, tr_dir).collect(),
                  key=lambda r: r["rank"])
    # only term-bearing docs score; decreasing keyword evidence
    assert [r["doc_id"] for r in rows] == [1, 2, 3]
    assert [r["rank"] for r in rows] == [1, 2, 3]
    scores = [r["bm25"] for r in rows]
    assert scores[0] > scores[1] > scores[2] > 0.0


def test_rrf_hybrid_topk_planted(spark, tr_dir):
    want = {}
    for d in range(1, 10):
        lex = LEX_RANKS.get(d, 0)  # 0 = the missing-ranker sentinel
        vec = VEC_RANKS[d]
        rrf = (1.0 / (60 + lex) if lex else 0.0) + 1.0 / (60 + vec)
        want[d] = (lex, vec, rrf)
    order = sorted(want, key=lambda d: (-want[d][2], d))
    got = sorted(QUERIES["rrf_hybrid_topk"](spark, tr_dir).collect(),
                 key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got] == order  # 1,3,2,4,5,6,7,8,9
    for r in got:
        lex, vec, rrf = want[r["doc_id"]]
        assert (r["lex_rank"], r["vec_rank"]) == (lex, vec)
        assert abs(r["rrf"] - rrf) < 1e-6


def test_ranker_agreement_topk_planted(spark, tr_dir):
    got = {r["k"]: (r["n_overlap"], r["overlap_micro"]) for r in
           QUERIES["ranker_agreement_topk"](spark, tr_dir).collect()}
    want = {}
    for k in (10, 25, 50):
        lex = {d for d, r in LEX_RANKS.items() if r <= k}
        vec = {d for d, r in VEC_RANKS.items() if r <= k}
        n = len(lex & vec)
        want[k] = (n, n * 1_000_000 // k)
    assert got == want  # the 3 lexical candidates overlap at every k
