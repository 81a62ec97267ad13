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
from dbt_project_spark.functions.expressions import cosine_similarity
from dbt_project_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    SIMHASH_BITS,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_signatures,
)
from dbt_project_spark.sources import load_table

JACCARD_T = 0.8
COSINE_T = 0.4

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
    pairs AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter,
             MAX(a.sz) AS sa, MAX(b.sz) AS sb
      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc < b.doc
      GROUP BY doc_a, doc_b)
    SELECT doc_a, doc_b, inter / (sa + sb - inter) AS jaccard
    FROM pairs WHERE inter / (sa + sb - inter) >= {JACCARD_T}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-3-gram Jaccard (shingle-join)."""
    return jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", JACCARD_T
    )


def _minhash_oracle() -> str:
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
    return f"""
    WITH {_EX_CTE},
    hashed AS (SELECT doc, sz, {_MD5INT.format(x='sg')} AS h FROM ex),
    sigs AS (SELECT doc, {mins} FROM hashed GROUP BY doc),
    bands AS (SELECT doc, {bands} FROM sigs),
    stack AS ({stack}),
    cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
             FROM stack a JOIN stack b ON a.bid = b.bid AND a.bv = b.bv AND a.doc < b.doc),
    ver AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter,
                   MAX(ea.sz) AS sa, MAX(eb.sz) AS sb
            FROM cand c JOIN ex ea ON ea.doc = c.doc_a
                        JOIN ex eb ON eb.doc = c.doc_b AND eb.sg = ea.sg
            GROUP BY c.doc_a, c.doc_b)
    SELECT doc_a, doc_b, inter / (sa + sb - inter) AS jaccard
    FROM ver WHERE inter / (sa + sb - inter) >= {JACCARD_T}
    """


@register("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidates verified by exact Jaccard."""
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", JACCARD_T
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


@register(
    "dedup_embedding",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb, a.embedding AS ea, b.embedding AS eb
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id),
    flat AS (SELECT va, vb, unnest(ea)::DOUBLE AS x, unnest(eb)::DOUBLE AS y FROM pairs),
    sims AS (SELECT va AS vec_a, vb AS vec_b,
                    ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cosine
             FROM flat GROUP BY va, vb)
    SELECT vec_a, vec_b, cosine FROM sims WHERE cosine >= {COSINE_T}
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by coarse label.

    Blocking keeps pair generation linear-ish (within-block only) —
    the label column stands in for a coarse LSH/IVF bucket at scale.
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("ea")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("label"), F.col("embedding").alias("eb")
    )
    return (
        a.join(b, on="label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(cosine_similarity("ea", "eb"), 6))
        .filter(F.col("cosine") >= COSINE_T)
        .select("vec_a", "vec_b", "cosine")
    )


@register(
    "dedup_editdistance",
    oracle="""
    WITH p AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_distance
    FROM p a JOIN p b
      ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection by edit distance (entity-resolution modality
    for short strings like names/titles). Blocked by first character —
    at scale the block key caps the quadratic pair space the same way
    shingle buckets do for documents; levenshtein itself is the
    built-in JVM DP, no UDF."""
    p = load_table(spark, sf_dir, "part").select("p_name").distinct()
    a = p.select(F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_name").alias("name_b"))
    return (
        a.join(
            b,
            (F.substring("name_a", 1, 1) == F.substring("name_b", 1, 1))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("edit_distance") <= 4)
        .select("name_a", "name_b", "edit_distance")
    )
