"""Similarity-search family over `embeddings`: exact brute-force
cosine top-k (correctness baseline) and hyperplane-LSH bucketed top-k
(the scale path) — both oracle-verified; the LSH oracle reproduces the
identical bucketing via the shared literal hyperplane matrix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_project_spark.catalog import register
from dbt_project_spark.operators.similarity import (
    LSH_W,
    bruteforce_topk,
    hyperplane_lsh_topk,
)
from dbt_project_spark.sources import load_table

TOPK = 10
NQUERIES = 5  # vec_id < 5 are the query vectors

_COS_FLAT = """
    flat AS (SELECT query_id, neighbor_id,
                    unnest(qe)::DOUBLE AS x, unnest(ce)::DOUBLE AS y
             FROM pairs),
    sims AS (SELECT query_id, neighbor_id,
                    ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cosine
             FROM flat GROUP BY query_id, neighbor_id),
    ranked AS (SELECT query_id, neighbor_id, cosine,
                      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
               FROM sims)
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
"""


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id < {NQUERIES}),
    pairs AS (SELECT q.query_id, e.vec_id AS neighbor_id, q.qe, e.embedding AS ce
              FROM q JOIN embeddings e ON e.vec_id != q.query_id),
    {_COS_FLAT.format(k=TOPK)}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the 5 query vectors."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < NQUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    return bruteforce_topk(q, c, TOPK)


def _lsh_bucket_sql(vec: str) -> str:
    """bucket expression via list_inner_product against the literal
    hyperplane matrix (sign bits only — accumulation-order-safe)."""
    terms = []
    for j, row in enumerate(LSH_W):
        lit = "[" + ", ".join(repr(x) for x in row) + "]"
        terms.append(
            f"(CASE WHEN list_inner_product({vec}::DOUBLE[], {lit}::DOUBLE[]) >= 0 "
            f"THEN {2**j} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS INT)"


@register(
    "ann_lsh_topk",
    oracle=f"""
    WITH b AS (SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b
          WHERE vec_id < {NQUERIES}),
    pairs AS (SELECT q.query_id, c.vec_id AS neighbor_id, q.qe, c.embedding AS ce
              FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id != q.query_id),
    {_COS_FLAT.format(k=TOPK)}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed approximate top-10 (same algorithm as
    the oracle: shared literal hyperplanes, sign-bit bucket, score
    within bucket only)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < NQUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    return hyperplane_lsh_topk(q, c, TOPK)
