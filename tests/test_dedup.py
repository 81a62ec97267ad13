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


def test_connected_components_chain_and_islands(spark):
    """A chain a-b-c must collapse to one component labeled by its min
    id even though a and c never share an edge (needs >1 propagation
    round); disjoint edges stay separate components."""
    from dbt_project_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(3, 2), (2, 1), (10, 11), (20, 21), (21, 22), (22, 23)],
        ["doc_a", "doc_b"],
    )
    labels = {
        r["node"]: r["lab"] for r in connected_components(edges).collect()
    }
    assert labels == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
    }


def test_jaccard_max_bucket_caps_planted_skew(spark):
    """One stop-shingle shared by ALL docs: uncapped, it alone creates
    O(n²) join rows; capped, it is dropped entirely and only genuine
    near-dups pair up."""
    hot = "of the and"  # one shared 3-gram across every doc
    docs = [(i, f"{hot} unique{i} distinct{i} word{i} token{i}") for i in range(40)]
    docs.append((100, "of the and unique1 distinct1 word1 token1"))  # near-dup of 1
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    capped = jaccard_pairs(df, "doc_id", "text", 0.5, max_bucket=10)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # The planted near-dup survives (it shares 4 non-hot shingles too)…
    assert (1, 100) in pairs
    # …and the hot shingle creates no other pair: 41 docs all share it,
    # so uncapped there would be ≥ 40·41/2 candidate pairs.
    assert pairs == {(1, 100)}

    # Candidate-stage bound: with the cap, the exploded+capped postings
    # self-join on the hot shingle contributes zero rows (bucket 41>10).
    from dbt_project_spark.operators.dedup import (
        _with_tokens,
        exploded_shingles,
    )
    from pyspark.sql import functions as F

    ex = exploded_shingles(_with_tokens(df, "text"), "doc_id")
    hot_bucket = ex.groupBy("sg").count().agg(F.max("count")).collect()[0][0]
    assert hot_bucket == 41  # the skew is real in the input


def test_embedding_lsh_pairs_recall_and_precision(spark):
    """Banded LSH must keep planted high-cosine near-dups and emit no
    pair below threshold (precision 1.0 by exact verify)."""
    import math
    import random

    from dbt_project_spark.operators.similarity import embedding_lsh_pairs

    rng = random.Random(7)
    dim = 64

    def unit():
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    base = [unit() for _ in range(20)]
    rows = [(i, base[i]) for i in range(20)]
    # plant near-dups: tiny perturbation of vectors 0..4 → cosine ≈ 0.999
    for i in range(5):
        v = [x + 0.01 * rng.gauss(0, 1) for x in base[i]]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((100 + i, [x / n for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    got = embedding_lsh_pairs(df, "vec_id", "embedding", 0.95, ntables=8, nbits=3)
    pairs = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in got.collect()}
    # at cosine≈0.999, per-table detect p^3 ≈ 0.97 → miss < 1e-12
    for i in range(5):
        assert (i, 100 + i) in pairs, f"planted near-dup {i} lost"
    assert all(c >= 0.95 for c in pairs.values())  # precision 1.0


def test_editdistance_max_block_caps_planted_skew(spark):
    """One hot prefix shared by ~all names (the Zipfian 'ma…' case):
    capped, the hot (pfx, band) blocks contribute zero candidates and
    only the genuine near-dup in a cool block pairs up; uncapped, the
    same input generates O(n²) candidates."""
    from dbt_project_spark.operators.dedup import editdistance_pairs

    # 40 same-length names under one prefix → both its (pfx, band)
    # blocks hold all 40.
    names = [(f"marlo{i:03d}",) for i in range(40)]
    names += [("zq lavender",), ("zq lavendar",)]  # cool block, distance 1
    df = spark.createDataFrame(names, ["p_name"])

    capped = editdistance_pairs(df, "p_name", max_dist=4, max_block=10)
    pairs = {(r["name_a"], r["name_b"]) for r in capped.collect()}
    assert pairs == {("zq lavendar", "zq lavender")}

    # The skew is real: uncapped, the hot prefix pairs quadratically.
    uncapped = editdistance_pairs(df, "p_name", max_dist=4)
    assert uncapped.count() > 40 * 39 / 4  # hundreds of marloXXX pairs


def test_editdistance_blocking_zero_loss_within_prefix(spark):
    """Planted typos: length banding must lose no pair with distance
    ≤4 (band width 4 ⇒ |len delta| ≤ 4 ⇒ adjacent bands meet)."""
    from dbt_project_spark.queries_dedup import dedup_editdistance

    names = [
        ("chartreuse lavender",),
        ("chartreuse lavendar",),  # 1 substitution
        ("chartreuse lavender xx",),  # 3 inserts (crosses a length band)
        ("chartreuse zzzzzzzz",),  # distance 8 — excluded
        ("dark chartreuse lavender",),  # different 2-prefix — documented miss
    ]
    df = spark.createDataFrame(names, ["p_name"])

    # Reuse the catalog operator's blocking via a temp parquet table.
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/part.parquet")
        got = dedup_editdistance(spark, d)
        pairs = {(r["name_a"], r["name_b"]): r["edit_distance"] for r in got.collect()}
    assert pairs[("chartreuse lavendar", "chartreuse lavender")] == 1
    assert pairs[("chartreuse lavender", "chartreuse lavender xx")] == 3
    assert pairs[("chartreuse lavendar", "chartreuse lavender xx")] == 4
    assert not any("zzzz" in a or "zzzz" in b for a, b in pairs)
    # the deliberate prefix miss: 'dark …' never pairs despite low
    # distance to nothing (distance to others is >4 anyway, but assert
    # no pair contains it to lock the documented blocking behavior)
    assert not any(a.startswith("dark") or b.startswith("dark") for a, b in pairs)


def test_incremental_index_flags_only_new_pairs(spark, tmp_path):
    """Incremental dedup against a saved index: new-vs-old and
    new-vs-new pairs are found, old-vs-old pairs (already found at
    index build) are never regenerated."""
    from dbt_project_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )

    old = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
            (4, "completely different words appear in this one here"),
        ],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "mh_index")
    build_minhash_index(old, "doc_id", "text", idx)

    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1/2
            (11, "fresh batch sentence with new vocabulary only"),
            (12, "fresh batch sentence with new vocabulary only"),  # dup of 11
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_minhash_pairs(
            spark, batch, "doc_id", "text", idx, 0.8
        ).collect()
    }
    assert (1, 10) in pairs and (2, 10) in pairs  # new vs old
    assert (11, 12) in pairs  # new vs new
    assert (1, 2) not in pairs  # old vs old: index build's job, not ours
    assert all(a < b for a, b in pairs)


def test_incremental_index_update_accumulates(spark, tmp_path):
    """update_index=True appends the batch so the NEXT batch sees it."""
    from dbt_project_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )

    old = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "mh_index")
    build_minhash_index(old, "doc_id", "text", idx)

    b1 = spark.createDataFrame(
        [(10, "brand new content in the first daily batch today")],
        ["doc_id", "text"],
    )
    p1 = incremental_minhash_pairs(
        spark, b1, "doc_id", "text", idx, 0.8, update_index=True
    )
    assert p1.count() == 0  # nothing matches yet; batch now indexed

    b2 = spark.createDataFrame(
        [(20, "brand new content in the first daily batch today")],  # dup of 10
        ["doc_id", "text"],
    )
    p2 = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_minhash_pairs(
            spark, b2, "doc_id", "text", idx, 0.8
        ).collect()
    }
    assert p2 == {(10, 20)}  # batch-1 doc found via the UPDATED index


def test_incremental_lazy_rescan_after_update_is_stable(spark, tmp_path):
    """Parquet scans resolve files at execution time: pairs collected
    AFTER update_index has appended the batch must still verify with
    single-counted shingles (same-batch dup stays jaccard == 1.0)."""
    from dbt_project_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )

    old = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "mh_index")
    build_minhash_index(old, "doc_id", "text", idx)

    batch = spark.createDataFrame(
        [
            (10, "fresh batch sentence with new vocabulary only"),
            (11, "fresh batch sentence with new vocabulary only"),
        ],
        ["doc_id", "text"],
    )
    pairs = incremental_minhash_pairs(
        spark, batch, "doc_id", "text", idx, 0.8, update_index=True
    )
    rows = pairs.collect()  # materialized AFTER the append
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(10, 11)}
    assert rows[0]["jaccard"] == 1.0


def test_strict_embedding_dedup_planted_recall(spark):
    """dedup_embedding_strict recovers planted clones at τ=0.9 with
    recall ≥0.9 (theoretical floor for (16,11) at the worst planted
    cosine 0.87 is 0.96; measured 25/25 at sf0.01) and emits nothing
    else: random pairs never reach 0.9 (measured max all-pairs cosine
    0.64 at sf0.1), so every output row is a planted pair."""
    from dbt_project_spark.catalog import QUERIES, load_all
    from dbt_project_spark.queries_dedup import (
        EMB_STRICT_T,
        PLANT_MOD,
        PLANT_STRIDE,
    )
    from dbt_project_spark.sources import load_table

    load_all()
    sf_dir = "/root/testdata/sf0.01"
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in QUERIES["dedup_embedding_strict"](spark, sf_dir).collect()
    }
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    planted_ids = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") % PLANT_MOD == 0).collect()
    ]
    assert planted_ids, "smoke data has no planted ids?"
    # every emitted pair is (orig, orig+STRIDE) above threshold
    for (a, b), cos in got.items():
        assert b == a + PLANT_STRIDE
        assert cos >= EMB_STRICT_T
    # recall vs brute force: clone cosine is >= 0.87 by construction;
    # pairs in [0.87, 0.9) are legitimately excluded by the exact
    # verify on both sides. Among above-τ planted pairs, LSH recall
    # must clear 0.9 (misses are deterministic given the hyperplanes
    # but individually possible at p^nbits ≈ 0.2 per table).
    import math

    base = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    above_tau = set()
    for vid in planted_ids:
        v = [float(x) for x in base[vid]]
        p = [
            x * (1.0 + ((vid * 31 + i + 1) % 11 - 5) * 0.125)
            for i, x in enumerate(v)
        ]
        dot = sum(x * y for x, y in zip(v, p))
        cos = dot / (
            math.sqrt(sum(x * x for x in v))
            * math.sqrt(sum(y * y for y in p))
        )
        if round(cos, 6) >= EMB_STRICT_T:
            above_tau.add(vid)
    found_as = {a for (a, _b) in got}
    assert found_as <= above_tau  # no pair the brute force rejects
    recall = len(found_as & above_tau) / len(above_tau)
    assert recall >= 0.9, f"planted recall {recall} < 0.9"
