"""Dedup operator tests: planted duplicates must be found (property
the reference checks by stream/batch comparison, here by construction)."""

import pytest

from dbt_project_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_pairs,
    simhash_signatures,
)

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
    (3, "alpha beta gamma delta epsilon zeta eta iota"),  # near dup of 1/2
    (4, "completely different words appear in this one here"),
    (5, "unrelated text with its own distinct vocabulary set"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(docs):
    kept = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs, "doc_id", "text").collect()}
    assert kept[1] == 2  # docs 1+2 collapse, min id kept
    assert 2 not in kept
    assert kept[3] == 1 and kept[4] == 1 and kept[5] == 1


def test_jaccard_finds_planted_pairs(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, "doc_id", "text", 0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert all(a < b for a, b in pairs)
    assert (4, 5) not in pairs


def test_jaccard_threshold_excludes(docs):
    pairs = jaccard_pairs(docs, "doc_id", "text", 0.99).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r["doc"]: tuple(r[f"mh{i}"] for i in range(16))
            for r in minhash_signatures(docs, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_minhash_lsh_finds_planted_pairs(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             minhash_lsh_pairs(docs, "doc_id", "text", 0.5).collect()}
    assert (1, 2) in pairs
    assert (4, 5) not in pairs


def test_simhash_signature_properties(docs):
    sigs = {r["doc"]: r["simhash"] for r in
            simhash_signatures(docs, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]  # identical docs → identical simhash
    assert 0 <= sigs[1] < 2**32


def test_simhash_pairs_hamming(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0


def test_empty_and_tiny_docs_no_crash(spark):
    tiny = spark.createDataFrame([(1, "one two"), (2, ""), (3, "x")], ["doc_id", "text"])
    assert jaccard_pairs(tiny, "doc_id", "text", 0.1).count() == 0
    assert minhash_lsh_pairs(tiny, "doc_id", "text", 0.1).count() == 0
