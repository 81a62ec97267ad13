"""Bit-identity of the r13 bruteforce_topk shortlist kernel vs the
crossJoin reference path (VERDICT r12 task 6): the Arrow kernel may
only PRUNE — the exact SQL re-score decides every rank — so outputs
must match the old full nq×n scoring bit-for-bit, including
degenerate rows and sub-rounding-grid near-ties."""

import math

import pyspark.sql.functions as F
import pytest

from dbt_project_spark.operators.similarity import (
    _bruteforce_topk_join,
    bruteforce_topk,
)


def _both(q, c, k):
    new = repr(bruteforce_topk(q, c, k).orderBy("query_id", "rank").collect())
    old = repr(
        _bruteforce_topk_join(
            q, c, k, "query_id", "neighbor_id", "qe", "embedding"
        )
        .orderBy("query_id", "rank")
        .collect()
    )
    return new, old


@pytest.fixture(scope="module")
def corpus(spark):
    # 40 vectors in 8 dims, deterministic LCG values
    state, rows = 7, []
    for vid in range(40):
        vec = []
        for _ in range(8):
            state = (1664525 * state + 1013904223) % (2**32)
            vec.append(round(state / 2**31 - 1.0, 6))
        rows.append((vid, vec))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_kernel_matches_join_path(spark, corpus):
    q = corpus.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    for k in (1, 3, 10, 100):  # k > corpus: keep-all branch
        new, old = _both(q, c, k)
        assert new == old


def test_kernel_near_tie_within_rounding_grid(spark):
    # neighbors whose true cosines straddle the 1e-6 rounding grid and
    # tie after round(.,6) — the slack must shortlist ALL of them and
    # the exact re-score must resolve the id tie-break identically
    base = [1.0, 0.0, 0.0, 0.0]
    rows = [(100 + i, [1.0, 1e-7 * i, 0.0, 0.0]) for i in range(12)]
    rows += [(50, [0.5, 0.5, 0.0, 0.0]), (51, [-1.0, 0.0, 0.0, 0.0])]
    c = spark.createDataFrame(rows, "neighbor_id bigint, embedding array<double>")
    q = spark.createDataFrame([(0, base)], "query_id bigint, qe array<double>")
    new, old = _both(q, c, 5)
    assert new == old


def test_kernel_degenerate_corpus_rows(spark, corpus):
    q = corpus.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    bad = spark.createDataFrame(
        [
            (1000, None),  # null vector -> null cosine, sorts last
            (1001, [float("nan")] * 8),  # NaN cosine, sorts FIRST desc
            (1002, [1.0, 2.0]),  # ragged -> zip_with null-pads -> null
            (1003, [1.0, None, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # null comp
        ],
        "neighbor_id bigint, embedding array<double>",
    )
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding").unionByName(bad)
    new, old = _both(q, c, 6)
    assert new == old
    assert "nan" in new  # the NaN row really ranked


def test_degenerate_queries_fall_back(spark, corpus):
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    qgood = corpus.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    for qbad_rows in (
        [(999, None)],
        [(999, [float("nan")] * 8)],
        [(999, [1.0, 2.0])],  # ragged vs dim-8 -> mixed dims
    ):
        qbad = qgood.unionByName(
            spark.createDataFrame(qbad_rows, "query_id bigint, qe array<double>")
        )
        new, old = _both(qbad, c, 4)
        assert new == old


def test_empty_query_set(spark, corpus):
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    q = corpus.filter("vec_id < 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    assert bruteforce_topk(q, c, 3).count() == 0


def test_margin_constant_covers_fold_error():
    # _TOPK_SLACK must dominate 2x the fold-vs-matmul float discrepancy
    # (~dim * 2^-52 for normalized inputs) plus the 2e-6 rounding-grid
    # term from the proof in similarity.py
    from dbt_project_spark.operators.similarity import _TOPK_SLACK

    dim = 4096  # far above any shipped embedding dim
    assert _TOPK_SLACK >= 2e-6 + 2 * (dim * 2.0**-52)
