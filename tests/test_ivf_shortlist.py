"""The r11 two-stage IVF assignment (operators/ivf.py
_shortlist_candidates): the numpy kernel may only PRUNE — the final
persisted assignment must be bit-identical to the full n×K exact SQL
pass, including rounded-cosine ties (lowest cid wins) and degenerate
rows. These corpora are adversarial on purpose: near-ties inside the
1e-6 rounding unit force multi-candidate shortlists, and zero/NaN
rows force the all-K fallback."""

import os
import random
import shutil

from pyspark.sql import functions as F

from dbt_project_spark.functions.expressions import dot_product, l2_norm
from dbt_project_spark.operators.ivf import (
    _assign_key,
    _shortlist_candidates,
    build_ivf_index,
    first_k_centroids,
    ivf_index_dir,
)


def _exact_assignment(e, k):
    """The pre-r11 full n×K reference pass, verbatim."""
    cent = first_k_centroids(e, k)
    ev = e.withColumn("nv", l2_norm("embedding"))
    cn = cent.withColumn("nc", l2_norm("ce"))
    scored = (
        ev.crossJoin(F.broadcast(cn))
        .withColumn(
            "s",
            F.round(
                dot_product("embedding", "ce") / (F.col("nv") * F.col("nc")), 6
            ),
        )
        .select("vec_id", "cid", "s")
    )
    asg = scored.groupBy("vec_id").agg(
        F.max_by("cid", _assign_key()).alias("cid")
    )
    return {(r["vec_id"], int(r["cid"])) for r in asg.collect()}


def _write(spark, sf_dir, rows, schema="vec_id bigint, embedding array<double>"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _build_assignment(spark, sf_dir, e):
    shutil.rmtree(ivf_index_dir(sf_dir), ignore_errors=True)
    meta = build_ivf_index(spark, sf_dir, e, force=True)
    cells = spark.read.parquet(
        os.path.join(ivf_index_dir(sf_dir), "cells.parquet")
    )
    got = {
        (r["vec_id"], int(r["cid"]))
        for r in cells.select("vec_id", "cid").collect()
    }
    shutil.rmtree(ivf_index_dir(sf_dir), ignore_errors=True)
    return meta, got


def test_shortlist_assignment_matches_exact_on_near_ties(spark, tmp_path):
    """Vectors built as tiny perturbations of the centroids land the
    runner-up cosine INSIDE the 1e-6 rounding unit — the shortlist
    must keep every tied centroid and stage 2 must break ties to the
    lowest cid exactly like the n×K pass."""
    sf_dir = str(tmp_path / "ties")
    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(16)]
    rows = [(i, base[i]) for i in range(16)]
    # near-tie probes: centroid i plus a 1e-9 nudge — cosine to several
    # centroids rounds equal when base vectors repeat
    for j in range(16, 64):
        src = base[j % 16]
        rows.append((j, [x + (1e-9 if d == j % 8 else 0.0) for d, x in enumerate(src)]))
    # exact duplicates of centroid 3 (cos = 1.0 to centroids 3 and any
    # colinear twin): tie must go to the LOWEST cid
    rows.append((64, list(base[3])))
    rows.append((65, [x * 2.0 for x in base[3]]))  # colinear, same cosine
    e = _write(spark, sf_dir, rows)
    meta, got = _build_assignment(spark, sf_dir, e)
    assert got == _exact_assignment(e, meta["k"])


def test_shortlist_assignment_matches_exact_on_degenerate_rows(
    spark, tmp_path
):
    """An all-identical corpus ties every vector against every
    centroid at cosine 1.0 — the shortlist keeps all K and stage 2
    must reproduce the exact reference row-for-row (lowest cid).
    Zero-norm vectors are out of contract for BOTH paths: ANSI
    division raises in the shared exact expression, unchanged."""
    sf_dir = str(tmp_path / "degen")
    rows = [(i, [1.0] * 8) for i in range(20)]
    rows += [(i, [-0.5] * 8) for i in range(20, 24)]  # colinear, cos -1
    e = _write(spark, sf_dir, rows)
    meta, got = _build_assignment(spark, sf_dir, e)
    assert got == _exact_assignment(e, meta["k"])
    assert len(got) == 24  # degenerate rows are assigned, not dropped


def test_shortlist_is_singleton_on_separated_corpus(spark, tmp_path):
    """On a well-separated random corpus the kernel prunes to ~1
    candidate per vector — the property the K× build win rests on
    (an always-all-K shortlist would be silently correct but slow)."""
    sf_dir = str(tmp_path / "sep")
    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(256)
    ]
    e = _write(spark, sf_dir, rows)
    cent = first_k_centroids(e, 16)
    pairs = _shortlist_candidates(spark, e, cent).count()
    assert 256 <= pairs <= 256 * 2  # avg well under 2 candidates/vector
