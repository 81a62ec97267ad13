"""Text-analysis + similarity operator tests."""

import math

import pytest

from dbt_project_spark.operators.similarity import (
    LSH_W,
    bruteforce_topk,
    with_lsh_bucket,
)
from dbt_project_spark.operators.text import (
    fingerprints,
    language_id,
    quality_features,
)


def test_quality_features_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today yes")], ["doc_id", "text"]
    )
    row = quality_features(df).collect()[0]
    assert row["n_tokens"] == 11
    assert row["n_stopwords"] == 2  # 'the' twice
    assert row["stopword_ratio"] == 2 / 11
    assert not row["is_quality"]  # < 20 tokens


def test_language_id_profiles(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "el perro y la casa de un gato que"),
            (3, "der hund und die katze ist von mit"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["predicted_lang"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de"}


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "delta gamma beta alpha")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["bag_fingerprint"] for r in fingerprints(df, "doc_id").collect()}
    assert rows[1] == rows[2]  # bag fingerprint ignores order


def _vec(*xs):
    return [float(x) for x in xs]


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, _vec(1, 0, 0, 0)),
        (1, _vec(0.9, 0.1, 0, 0)),  # closest to 0
        (2, _vec(0, 1, 0, 0)),
        (3, _vec(-1, 0, 0, 0)),  # opposite of 0
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_bruteforce_topk_ordering(spark, vectors):
    import pyspark.sql.functions as F

    q = vectors.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = vectors.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    got = bruteforce_topk(q, c, 3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in got] == [1, 2, 3]
    assert got[0]["cosine"] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)
    assert got[2]["cosine"] == -1.0


def test_lsh_bucket_deterministic(spark, vectors):
    spark64 = vectors.selectExpr(
        "vec_id", "flatten(array_repeat(embedding, 16)) AS embedding"
    )  # pad to LSH_DIM=64
    b1 = {r["vec_id"]: r["bucket"] for r in with_lsh_bucket(spark64).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in with_lsh_bucket(spark64).collect()}
    assert b1 == b2
    assert all(0 <= v < 2 ** len(LSH_W) for v in b1.values())
    # identical vectors land in identical buckets; opposite vectors differ
    assert b1[0] != b1[3]
