"""SemDeDup planted-semantics tests (queries_dedup.dedup_semantic):
axis-aligned embeddings make cluster membership and every pairwise
cosine exact (1.0 same-axis, 0.0 cross-axis), so the expected pair
set is computable by hand."""

import os
import shutil

from dbt_project_spark.operators.ivf import ivf_index_dir
from dbt_project_spark.queries_dedup import (
    PLANT_MOD,
    PLANT_STRIDE,
    dedup_semantic,
    dedup_semantic_recall,
)

N = 64  # ivf_params(64) -> k=16 (min clamp): centroids = vecs 0..15
DIM = 8


def _axis_corpus(spark, sf_dir):
    """vec i = (1 + i/2)·e_{i%8}: same-axis cosine exactly 1.0,
    cross-axis exactly 0.0. Multiplicative clone noise preserves an
    axis vector's direction, so every planted clone has cosine 1.0
    with its source and ties into the SAME cell (lowest-cid
    tie-break picks centroid a for axis a on both sides)."""
    rows = []
    for i in range(N):
        v = [0.0] * DIM
        v[i % DIM] = 1.0 + i * 0.5
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )


def test_dedup_semantic_planted_axes(spark, tmp_path):
    sf_dir = str(tmp_path / "sfsem")
    _axis_corpus(spark, sf_dir)
    shutil.rmtree(ivf_index_dir(sf_dir), ignore_errors=True)
    try:
        rows = dedup_semantic(spark, sf_dir).collect()
        # clones planted at 0,20,40,60 -> axes 0,4,0,4: cells for
        # axes 0 and 4 hold 8+2 members, the other six hold 8.
        expect_pairs = 2 * (10 * 9 // 2) + 6 * (8 * 7 // 2)
        assert len(rows) == expect_pairs
        assert all(r["cosine"] == 1.0 for r in rows)
        # pairs never cross cells, and each cell is one axis: the two
        # sides of every pair share an axis (clone axis = source axis)
        def axis(vid):
            return (vid - PLANT_STRIDE if vid >= PLANT_STRIDE else vid) % DIM

        assert all(axis(r["vec_a"]) == axis(r["vec_b"]) for r in rows)
        # every planted (source, clone) pair is present
        got = {(r["vec_a"], r["vec_b"]) for r in rows}
        for v in range(0, N, PLANT_MOD):
            assert (v, v + PLANT_STRIDE) in got
    finally:
        shutil.rmtree(ivf_index_dir(sf_dir), ignore_errors=True)


def test_dedup_semantic_recall_planted_full(spark, tmp_path):
    sf_dir = str(tmp_path / "sfsem2")
    _axis_corpus(spark, sf_dir)
    shutil.rmtree(ivf_index_dir(sf_dir), ignore_errors=True)
    try:
        r = dedup_semantic_recall(spark, sf_dir).collect()[0]
        assert r["n_true_pairs"] == len(range(0, N, PLANT_MOD)) == 4
        assert r["n_same_cell"] == 4
        assert r["recall_micro"] == 1_000_000
    finally:
        shutil.rmtree(ivf_index_dir(sf_dir), ignore_errors=True)


def test_semantic_keeplist_invariants(spark):
    """Every cluster keeps exactly one member — its min vec_id — and
    every emitted vector appears in some dedup_semantic pair."""
    from dbt_project_spark.queries_dedup import (
        dedup_semantic,
        dedup_semantic_keeplist,
    )

    sf = "/root/testdata/sf0.001"
    rows = dedup_semantic_keeplist(spark, sf).collect()
    assert rows, "expected planted clone pairs to produce clusters"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert min(m["vec_id"] for m in members) == cid
        assert sum(m["keep"] for m in members) == 1
        assert all(m["cluster_size"] == len(members) for m in members)
    paired = set()
    for p in dedup_semantic(spark, sf).collect():
        paired.add(p["vec_a"])
        paired.add(p["vec_b"])
    assert {r["vec_id"] for r in rows} == paired
