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


def _cos_ranked_sql(pairs: str, suffix: str, k: int) -> str:
    """Suffixed copy of the cosine-rank CTE stack (CTE names are
    file-scope in SQL, so combining two rankings in one oracle needs
    distinct names)."""
    return f"""
    flat{suffix} AS (SELECT query_id, neighbor_id,
                    unnest(qe)::DOUBLE AS x, unnest(ce)::DOUBLE AS y
             FROM {pairs}),
    sims{suffix} AS (SELECT query_id, neighbor_id,
                    ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6)
                        AS cosine
             FROM flat{suffix} GROUP BY query_id, neighbor_id),
    top{suffix} AS (SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sims{suffix})
              WHERE rank <= {k})"""


@register(
    "ann_recall_lsh",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id < {NQUERIES}),
    pairs_bf AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                        q.qe, e.embedding AS ce
                 FROM q JOIN embeddings e ON e.vec_id != q.query_id),
    {_cos_ranked_sql('pairs_bf', '_bf', TOPK)},
    b AS (SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
          FROM embeddings),
    ql AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b
           WHERE vec_id < {NQUERIES}),
    pairs_lsh AS (SELECT ql.query_id, c.vec_id AS neighbor_id,
                         ql.qe, c.embedding AS ce
                  FROM ql JOIN b c ON c.bucket = ql.bucket
                                  AND c.vec_id != ql.query_id),
    {_cos_ranked_sql('pairs_lsh', '_lsh', TOPK)},
    m AS (SELECT t.query_id, CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_matched
          FROM top_bf t LEFT JOIN top_lsh l
            ON l.query_id = t.query_id AND l.neighbor_id = t.neighbor_id
          GROUP BY t.query_id)
    SELECT query_id, CAST({TOPK} AS BIGINT) AS k, n_matched,
           ROUND(n_matched * 1.0 / {TOPK}, 6) AS recall
    FROM m
    """,
)
def ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH-bucketed ANN against the exact brute-force
    ranking, per query — the quality metric every production ANN
    deployment monitors next to its latency (an index that silently
    drops to recall 0.3 is worse than a slow exact scan). Both
    rankings are deterministic (shared literal hyperplanes, total
    tie-break order), so even this meta-metric hash-gates exactly.

    Scale shape: the brute-force side is the correctness anchor and
    costs queries×corpus — at 100 TB you run it over a SAMPLED query
    set (queries here are 5 fixed ids, exactly that shape); the LSH
    side is bucket-local. The final comparison joins two ≤(queries×k)
    heaps — negligible. A scheduled job alerting on this query is the
    index-drift monitor.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < NQUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    bf = bruteforce_topk(q, c, TOPK).select("query_id", "neighbor_id")
    lsh = hyperplane_lsh_topk(q, c, TOPK).select(
        F.col("query_id").alias("lq"), F.col("neighbor_id").alias("ln")
    )
    m = (
        bf.join(
            lsh,
            (F.col("lq") == F.col("query_id"))
            & (F.col("ln") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("ln").cast("bigint").alias("n_matched"))
    )
    return m.select(
        "query_id",
        F.lit(TOPK).cast("bigint").alias("k"),
        "n_matched",
        F.round(F.col("n_matched") * 1.0 / TOPK, 6).alias("recall"),
    )
