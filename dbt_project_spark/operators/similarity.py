"""Similarity search over embedding columns.

Two paths, the standard scale trade-off:
- ``bruteforce_topk``: exact cosine top-k. The fan-out is a broadcast
  of the (small) query set against the candidate corpus — at 100 TB
  the corpus side streams through executors once, never shuffles, and
  top-k per query is a windowed rank over query-partitioned rows
  (bounded by |queries| × |corpus-partition| intermediate rows).
- ``hyperplane_lsh_topk``: random-hyperplane (SimHash-for-vectors)
  bucketing; only same-bucket candidates are scored. Recall < 1 by
  construction, cost drops by ~2^nbits. The hyperplane matrix is a
  deterministic literal (LCG-generated), so the exact same algorithm
  is reproducible in ANSI SQL for the oracle.

Vector math is JVM-side ``zip_with``/``aggregate`` (functions/
expressions.py) — no Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_project_spark.functions.expressions import cosine_similarity, dot_product

LSH_NBITS = 8
LSH_DIM = 64


def _lcg_weights(nbits: int = LSH_NBITS, dim: int = LSH_DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1): a plain LCG
    (numerical-recipes constants) so the literal matrix is identical
    in the Spark plan and the oracle SQL."""
    state = 42
    out = []
    for _ in range(nbits):
        row = []
        for _ in range(dim):
            state = (1664525 * state + 1013904223) % (2**32)
            row.append(round(state / 2**31 - 1.0, 6))
        out.append(row)
    return out


LSH_W = _lcg_weights()


def bruteforce_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "neighbor_id",
    qvec: str = "qe",
    cvec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus."""
    sims = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn("cosine", F.round(cosine_similarity(qvec, cvec), 6))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(corpus_id))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def with_lsh_bucket(df: DataFrame, vec: str = "embedding") -> DataFrame:
    """Assign each vector its hyperplane-sign bucket (int in [0, 2^nbits))."""
    bucket = F.lit(0)
    for j, row in enumerate(LSH_W):
        w = F.array(*[F.lit(x) for x in row])
        bucket = bucket + F.when(
            dot_product(F.col(vec), w) >= 0, F.lit(2**j)
        ).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket.cast("int"))


def hyperplane_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "neighbor_id",
    qvec: str = "qe",
    cvec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's bucket."""
    qb = with_lsh_bucket(queries, qvec)
    cb = with_lsh_bucket(corpus, cvec)
    sims = (
        F.broadcast(qb)
        .join(cb, on="bucket")
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn("cosine", F.round(cosine_similarity(qvec, cvec), 6))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(corpus_id))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
