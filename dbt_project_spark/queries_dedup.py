"""Deduplication family — exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine — over `documents` / `embeddings`.

The oracle SQL is generated from the SAME constants as the Spark
operators (operators/dedup.py), so the MinHash permutations, band
layout, and SimHash bit math are one source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_project_spark.catalog import register
from dbt_project_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    SIMHASH_BITS,
    build_minhash_index,
    editdistance_pairs,
    exact_dedup,
    incremental_minhash_pairs,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_signatures,
)
from dbt_project_spark.operators.similarity import embedding_lsh_pairs
from dbt_project_spark.sources import load_table

JACCARD_T = 0.8
COSINE_T = 0.4
# Skew cap for the shared-shingle self-join: a shingle held by more
# than MAX_BUCKET docs is a stop-shingle — useless for near-dup
# evidence (it can only push Jaccard DOWN for true dups, since set
# sizes keep counting it) and quadratic in the join. At sf0.1 the
# hottest bucket is 25 docs, so 64 changes nothing at test scale
# while bounding hot buckets at any corpus size. Recall effect:
# dropped shingles reduce measured intersection only, so surviving
# pairs are true positives (precision 1.0); a pair loses at most
# its share of capped shingles of measured Jaccard.
MAX_BUCKET = 64
# Banded hyperplane LSH for embedding dedup: 8 tables × 3 bits —
# sized for the test threshold 0.4 (p≈0.65/bit → recall ≈0.9);
# production thresholds (0.9+) want nbits 12-16. See
# operators/similarity.py:embedding_lsh_pairs.
EMB_NTABLES = 8
EMB_NBITS = 3

# ---- shared oracle fragments (DuckDB) ----
_MD5INT = "('0x' || substr(md5({x}), 1, 8))::BIGINT"
_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_SHINGLES = (
    "CASE WHEN len(t) >= 3 THEN list_distinct(list_transform("
    "range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
    " ELSE [] END"
)
_EX_CTE = f"""
  toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
  sh AS (SELECT doc_id, {_SHINGLES} AS s FROM toks),
  ex AS (SELECT doc_id AS doc, len(s) AS sz, unnest(s) AS sg FROM sh)
"""


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fingerprint, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by 128-bit content hash, keeping smallest doc_id."""
    return exact_dedup(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_EX_CTE},
    capped AS (
      SELECT doc, sz, sg FROM (
        SELECT doc, sz, sg, COUNT(*) OVER (PARTITION BY sg) AS bn FROM ex)
      WHERE bn <= {MAX_BUCKET}),
    pairs AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter,
             MAX(a.sz) AS sa, MAX(b.sz) AS sb
      FROM capped a JOIN capped b ON a.sg = b.sg AND a.doc < b.doc
      GROUP BY doc_a, doc_b)
    SELECT doc_a, doc_b, inter / (sa + sb - inter) AS jaccard
    FROM pairs WHERE inter / (sa + sb - inter) >= {JACCARD_T}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-3-gram Jaccard (shingle-join),
    with the MAX_BUCKET stop-shingle cap bound (mirrored in the
    oracle, so parity holds at any scale)."""
    return jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        JACCARD_T,
        max_bucket=MAX_BUCKET,
    )


def _minhash_oracle(cand_pred: str = "", extra_cols: str = "") -> str:
    """Full MinHash-LSH pipeline in DuckDB SQL. ``cand_pred``
    restricts the candidate pairs (incremental variant: at least one
    side in the new batch); ``extra_cols`` appends output columns."""
    k = len(MINHASH_A)
    r = k // 4
    mins = ",\n           ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    bands = ",\n           ".join(
        _MD5INT.format(
            x=" || ',' || ".join(f"mh{bnd * r + j}" for j in range(r))
        )
        + f" AS band{bnd}"
        for bnd in range(4)
    )
    stack = " UNION ALL ".join(
        f"SELECT doc, {bnd} AS bid, band{bnd} AS bv FROM bands" for bnd in range(4)
    )
    where = f"WHERE {cand_pred}" if cand_pred else ""
    return f"""
    WITH {_EX_CTE},
    hashed AS (SELECT doc, sz, {_MD5INT.format(x='sg')} AS h FROM ex),
    sigs AS (SELECT doc, {mins} FROM hashed GROUP BY doc),
    bands AS (SELECT doc, {bands} FROM sigs),
    stack AS ({stack}),
    cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
             FROM stack a JOIN stack b ON a.bid = b.bid AND a.bv = b.bv AND a.doc < b.doc
             {where}),
    ver AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter,
                   MAX(ea.sz) AS sa, MAX(eb.sz) AS sb
            FROM cand c JOIN ex ea ON ea.doc = c.doc_a
                        JOIN ex eb ON eb.doc = c.doc_b AND eb.sg = ea.sg
            GROUP BY c.doc_a, c.doc_b)
    SELECT doc_a, doc_b, inter / (sa + sb - inter) AS jaccard{extra_cols}
    FROM ver WHERE inter / (sa + sb - inter) >= {JACCARD_T}
    """


@register("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidates verified by exact Jaccard."""
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", JACCARD_T
    )


# Incremental dedup: documents with doc_id % NEW_MOD == 0 play the
# role of "today's batch"; the rest are the already-indexed corpus.
NEW_MOD = 10


@register(
    "dedup_incremental",
    oracle=_minhash_oracle(
        cand_pred=f"a.doc % {NEW_MOD} = 0 OR b.doc % {NEW_MOD} = 0",
        extra_cols=(
            f",\n           CASE WHEN doc_a % {NEW_MOD} = 0 "
            f"AND doc_b % {NEW_MOD} = 0 THEN 'new_new' "
            "ELSE 'new_old' END AS pair_kind"
        ),
    ),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch-vs-corpus MinHash dedup against a PERSISTED index —
    the shape production dedup runs daily (reference has no
    counterpart; LLM-pipeline extension).

    The corpus side (doc_id % 10 != 0) is signed once into a parquet
    index (banded signatures + shingle postings); the batch
    (doc_id % 10 == 0) computes its own signatures and joins the saved
    bands — corpus text is never re-read and corpus-vs-corpus pairs
    are never regenerated. The oracle is the full-recompute pipeline
    restricted to pairs with ≥1 new side: proves incremental == full
    recompute on exactly the pairs a batch run owes.
    """
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % NEW_MOD != 0)
    new = docs.filter(F.col("doc_id") % NEW_MOD == 0)
    tag = os.path.basename(os.path.normpath(sf_dir))
    index_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_mh_index_{tag}"
    )
    build_minhash_index(old, "doc_id", "text", index_dir)
    pairs = incremental_minhash_pairs(
        spark, new, "doc_id", "text", index_dir, JACCARD_T
    )
    return pairs.withColumn(
        "pair_kind",
        F.when(
            (F.col("doc_a") % NEW_MOD == 0) & (F.col("doc_b") % NEW_MOD == 0),
            F.lit("new_new"),
        ).otherwise(F.lit("new_old")),
    )


def _simhash_oracle() -> str:
    votes = ",\n           ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    bands = ", ".join(
        f"CAST((simhash >> {bnd * 8}) & 255 AS INT) AS band{bnd}"
        for bnd in range(SIMHASH_BITS // 8)
    )
    return f"""
    WITH toks AS (SELECT doc_id AS doc, unnest({_TOKS}) AS tk FROM documents),
    hashed AS (SELECT doc, {_MD5INT.format(x='tk')} AS h FROM toks),
    votes AS (SELECT doc, {votes} FROM hashed GROUP BY doc),
    sigs AS (SELECT doc, CAST({sig} AS BIGINT) AS simhash FROM votes)
    SELECT doc, simhash, {bands} FROM sigs
    """


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc SimHash signature + 8-bit hamming-bucket bands."""
    return simhash_signatures(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


def _emb_oracle() -> str:
    """Banded-LSH embedding dedup in ANSI SQL: identical literal
    hyperplanes, identical band layout, exact cosine verify."""
    from dbt_project_spark.operators.similarity import lsh_table_weights

    w = lsh_table_weights(EMB_NTABLES, EMB_NBITS)
    band_exprs = []
    for t, rows in enumerate(w):
        terms = []
        for j, row in enumerate(rows):
            lit = "[" + ", ".join(repr(x) for x in row) + "]"
            terms.append(
                f"(CASE WHEN list_inner_product(embedding::DOUBLE[], "
                f"{lit}::DOUBLE[]) >= 0 THEN {2**j} ELSE 0 END)"
            )
        band_exprs.append("CAST(" + " + ".join(terms) + f" AS INT) AS b{t}")
    stack = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tid, b{t} AS bv FROM bk"
        for t in range(EMB_NTABLES)
    )
    return f"""
    WITH bk AS (SELECT vec_id, embedding, {", ".join(band_exprs)} FROM embeddings),
    st AS ({stack}),
    cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
             FROM st a JOIN st b ON a.tid = b.tid AND a.bv = b.bv
                                AND a.vec_id < b.vec_id),
    pairs AS (SELECT va, vb, ea.embedding AS ea, eb.embedding AS eb
              FROM cand JOIN embeddings ea ON ea.vec_id = va
                        JOIN embeddings eb ON eb.vec_id = vb),
    flat AS (SELECT va, vb, unnest(ea)::DOUBLE AS x, unnest(eb)::DOUBLE AS y FROM pairs),
    sims AS (SELECT va AS vec_a, vb AS vec_b,
                    ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cosine
             FROM flat GROUP BY va, vb)
    SELECT vec_a, vec_b, cosine FROM sims WHERE cosine >= {COSINE_T}
    """


@register("dedup_embedding", oracle=_emb_oracle())
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded hyperplane LSH.

    Round 1 blocked on the `label` column: quadratic within blocks
    and only 8.5% recall (5 of 59 true pairs at sf0.01). Banded LSH
    (8 tables × 3 bits at this threshold) is bucket-local at any
    corpus size and measured 90% recall; precision stays 1.0 (exact
    cosine verify on candidates only)."""
    return embedding_lsh_pairs(
        load_table(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        COSINE_T,
        ntables=EMB_NTABLES,
        nbits=EMB_NBITS,
    )


@register(
    "dedup_editdistance",
    oracle=f"""
    WITH p AS (SELECT DISTINCT p_name FROM part),
    blocked AS (
      SELECT p_name, substr(p_name, 1, 2) AS pfx,
             unnest([CAST(floor(len(p_name) / 4) AS INT),
                     CAST(floor(len(p_name) / 4) AS INT) + 1]) AS band
      FROM p),
    capped AS (
      SELECT p_name, pfx, band FROM (
        SELECT p_name, pfx, band,
               COUNT(*) OVER (PARTITION BY pfx, band) AS bn FROM blocked)
      WHERE bn <= {{max_block}}),
    cand AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM capped a JOIN capped b
        ON a.pfx = b.pfx AND a.band = b.band AND a.p_name < b.p_name)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS edit_distance
    FROM cand WHERE levenshtein(name_a, name_b) <= 4
    """.format(max_block=64),
)
def dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection by edit distance (entity-resolution modality
    for short strings like names/titles).

    Blocking is (2-char prefix, length÷4 band): each name is emitted
    into its band and band+1, so any pair whose bands differ by ≤1
    meets on an equi-key. Edit distance ≤4 bounds |len_a-len_b| ≤ 4,
    which with band width 4 bounds the band delta to ≤1 — the length
    banding loses ZERO recall. The 2-char prefix (vs round 1's 1-char:
    ≤36 coarse buckets, quadratic within) misses only pairs whose
    edits touch the first two characters — at sf0.01 that is 0 of 88
    pairs. levenshtein is the built-in JVM DP, no UDF; the candidate
    join is equi-key end-to-end (shuffle-partitionable, never a
    theta-join).

    Hot blocks are capped at MAX_BUCKET=64 names per (pfx, band) via
    the same broadcast-anti-join pattern as jaccard_pairs — real name
    distributions are Zipfian ("ma…", "jo…"), so an uncapped block
    goes O(block²) at 100×. At test scale the largest block is 8
    names, so the cap changes nothing; the cap is mirrored in the
    oracle so parity holds at any scale. See
    operators/dedup.py:editdistance_pairs for the recall argument."""
    p = load_table(spark, sf_dir, "part").select("p_name").distinct()
    return editdistance_pairs(p, "p_name", max_dist=4, max_block=64)
