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


def lsh_table_weights(ntables: int, nbits: int, dim: int = LSH_DIM) -> list[list[list[float]]]:
    """Deterministic hyperplanes for banded LSH: ``ntables`` tables of
    ``nbits`` hyperplanes each (same LCG stream as ``LSH_W``, so the
    literal matrix is reproducible in the oracle SQL)."""
    flat = _lcg_weights(ntables * nbits, dim)
    return [flat[t * nbits : (t + 1) * nbits] for t in range(ntables)]


def with_lsh_bands(
    df: DataFrame,
    vec: str,
    weights: list[list[list[float]]],
    id_col: str,
    id_out: str = "doc",
) -> DataFrame:
    """Explode each vector to (id, tid, bv): one sign-bucket per table.

    Output is ids+ints only — vectors are NOT carried through the
    band shuffle (candidates join back to the corpus by id), so the
    band-join stage shuffles O(rows × ntables × 12 bytes) regardless
    of vector dimension."""
    cols = []
    for tid, rows in enumerate(weights):
        bucket = F.lit(0)
        for j, row in enumerate(rows):
            w = F.array(*[F.lit(x) for x in row])
            bucket = bucket + F.when(
                dot_product(F.col(vec), w) >= 0, F.lit(2**j)
            ).otherwise(F.lit(0))
        cols.append(
            F.struct(F.lit(tid).alias("tid"), bucket.cast("int").alias("bv"))
        )
    return df.select(
        F.col(id_col).alias(id_out), F.explode(F.array(*cols)).alias("bx")
    ).select(id_out, "bx.tid", "bx.bv")


def embedding_lsh_pairs(
    corpus: DataFrame,
    id_col: str,
    vec: str,
    threshold: float,
    ntables: int = 8,
    nbits: int = 3,
) -> DataFrame:
    """Near-dup vector pairs via banded hyperplane LSH + exact verify.

    Candidates = pairs sharing ANY table's sign-bucket; each candidate
    is then scored with exact cosine, so precision is 1.0 and only
    recall is approximate. Per-table detect probability for a pair at
    angle θ is (1-θ/π)^nbits; overall recall = 1-(1-p^nbits)^ntables.
    Candidate volume scales as ntables/2^nbits × all-pairs, so nbits
    is the scale dial: at a production near-dup threshold (cosine
    ≥0.9, p≈0.9) nbits=12-16 keeps recall >0.95 with a 2^12/ntables
    reduction; the catalog binding uses nbits=3 only because its test
    threshold (0.4, p≈0.65) is far below any real dedup bar.

    Blocking is bucket-local at any corpus size — never an O(n²)
    cross join (the r01 label-blocked version measured 8.5% recall
    and was quadratic within label blocks; reference parity per
    VERDICT.md round-1 E-family).

    Measured parameter curve at sf0.1 (2000 vecs, 920 true pairs at
    the 0.4 test threshold): (8,3)→65% of all-pairs as candidates,
    recall 0.91; (12,4)→54%, 0.90; (18,5)→44%, 0.87; (28,6)→37%,
    0.86. A 0.4 threshold sits near the bulk of the similarity
    distribution, so candidate pruning is inherently weak — at a
    production threshold (0.9) the same construction prunes by
    ~ntables/2^nbits with recall held by the much higher per-bit
    agreement probability.

    Measured at 10× (r03): the candidate fractions above are the
    THEORETICAL random-collision floor 1-(1-2^-nbits)^ntables at both
    sf0.1 and sf1 (0.651 for (8,3) at n=2000 and n=20000; mean-
    centering before hashing changes nothing) — the synthetic
    embeddings are i.i.d.-random with no cluster structure, so a
    below-bulk threshold makes the OUTPUT itself Θ(n²) and no
    parameter choice can be sub-quadratic. With planted near-dups at
    τ=0.9, (16,11) measures recall 1.0 with the candidate rate at its
    0.8% floor (see queries_dedup.dedup_embedding_strict). At a fixed
    false-candidate budget, nbits is the log(n) dial: each extra bit
    halves the random collision rate, so nbits ≈ log2(n·ntables/
    budget_pairs_per_row) keeps candidates linear in n."""
    from dbt_project_spark.caching import persist_tracked
    from dbt_project_spark.functions.expressions import dot_product as _dot
    from dbt_project_spark.functions.expressions import l2_norm as _l2

    w = lsh_table_weights(ntables, nbits)
    # Persist the band projection: both self-join sides consume it and
    # Spark does not dedup the subtree — without it the ntables×nbits
    # hyperplane dot products are computed twice per vector. Tracked:
    # released when the next catalog query is built.
    bands = persist_tracked(with_lsh_bands(corpus, vec, w, id_col, id_out="doc"))
    a = bands.select(F.col("doc").alias("vec_a"), "tid", "bv")
    b = bands.select(F.col("doc").alias("vec_b"), "tid", "bv")
    cand = (
        a.join(b, on=["tid", "bv"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    # Norms are per-VECTOR (computed once, n times total), not per
    # candidate pair — the verify stage then does one zip_with dot and
    # one double division per pair. Same fp evaluation order as the
    # oracle's SQRT(SUM(x*x)) * SQRT(SUM(y*y)) (sequential sum, sqrt,
    # multiply), so 6-dp parity is preserved.
    ea = corpus.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec).alias("__ea"),
        _l2(vec).alias("__na"),
    )
    eb = corpus.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec).alias("__eb"),
        _l2(vec).alias("__nb"),
    )
    return (
        cand.join(ea, on="vec_a")
        .join(eb, on="vec_b")
        .withColumn(
            "cosine",
            F.round(
                _dot("__ea", "__eb") / (F.col("__na") * F.col("__nb")), 6
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


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
