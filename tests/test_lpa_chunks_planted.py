"""Planted tests: label propagation on disjoint triangles (closed-form
community flood) and chunk-level dedup with hand-counted block
collisions."""

from pyspark.sql import functions as F


def test_label_propagation_two_triangles(spark):
    """Two disjoint triangles: min-tie-break LPA floods each to its
    smallest node id within 4 rounds."""
    from dbt_project_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12)],
        "u bigint, v bigint",
    )
    lab = {r["node"]: r["lab"] for r in label_propagation(edges, 4).collect()}
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_lpa_isolated_edge_pair_stabilizes(spark):
    """A single edge: both nodes adopt each other's label in round 1
    (1->2's label? no: 1's only neighbor is 2 with label 2 -> 1 takes
    2... then they swap each round; the FIXED 4-round unroll is still
    deterministic). After an even number of rounds labels return to
    the start."""
    from dbt_project_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(1, 2)], "u bigint, v bigint")
    lab = {r["node"]: r["lab"] for r in label_propagation(edges, 4).collect()}
    # round1: 1<-2, 2<-1; round2: swap back; ... round4 == start
    assert lab == {1: 1, 2: 2}


def test_mm_chunk_dedup_hand_counted(spark, tmp_path):
    from dbt_project_spark.queries_multimodal import mm_chunk_dedup

    texts = ["x" * 128, "x" * 128, "y" * 64]
    rows = [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    r = mm_chunk_dedup(spark, str(tmp_path)).collect()[0]
    # docs 0/1: two identical "x"*64 chunks each; doc 2: one "y"*64
    assert r["n_docs"] == 3
    assert r["n_chunks"] == 5
    assert r["n_distinct_chunks"] == 2
    assert r["dup_chunks"] == 3
    assert r["unique_ratio_micro"] == 2 * 1_000_000 // 5
