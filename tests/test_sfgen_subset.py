"""Subset generation in sfgen.ensure_scaled (r10: the sf10 scale-proof
generates documents/embeddings only — a full sf10 TPC-H universe would
be wasted disk). Pins the marker bookkeeping: subset marker records
the present tables, later calls generate only the missing ones, and a
legacy marker means everything is present."""

import os

from dbt_project_spark.sfgen import ensure_scaled
from tests.conftest import SF_SMOKE


def _tables(dst):
    return {
        n[: -len(".parquet")]
        for n in os.listdir(dst)
        if n.endswith(".parquet")
    }


def test_subset_then_incremental(spark, tmp_path):
    dst = str(tmp_path / "sf_sub")
    ensure_scaled(spark, SF_SMOKE, dst, factor=2, tables=["documents"])
    assert _tables(dst) == {"documents"}
    marker = open(os.path.join(dst, "_DONE")).read()
    assert "tables=documents" in marker

    # second call with a wider subset generates only the missing table
    ensure_scaled(
        spark, SF_SMOKE, dst, factor=2, tables=["documents", "embeddings"]
    )
    assert _tables(dst) == {"documents", "embeddings"}
    assert "tables=documents,embeddings" in open(
        os.path.join(dst, "_DONE")
    ).read()

    # already-satisfied request is a no-op (marker unchanged)
    before = os.path.getmtime(os.path.join(dst, "_DONE"))
    ensure_scaled(spark, SF_SMOKE, dst, factor=2, tables=["embeddings"])
    assert os.path.getmtime(os.path.join(dst, "_DONE")) == before


def test_legacy_marker_means_complete(spark, tmp_path):
    dst = str(tmp_path / "sf_legacy")
    os.makedirs(dst)
    with open(os.path.join(dst, "_DONE"), "w") as fh:
        fh.write(f"factor=2 src={SF_SMOKE}\n")  # pre-r10 marker format
    ensure_scaled(spark, SF_SMOKE, dst, factor=2, tables=["documents"])
    assert _tables(dst) == set()  # nothing regenerated


def test_scaled_rows_multiply(spark, tmp_path):
    dst = str(tmp_path / "sf_x2")
    ensure_scaled(spark, SF_SMOKE, dst, factor=2, tables=["documents"])
    src_n = spark.read.parquet(
        os.path.join(SF_SMOKE, "documents.parquet")
    ).count()
    dst_n = spark.read.parquet(os.path.join(dst, "documents.parquet")).count()
    assert dst_n == 2 * src_n


def test_factor_mismatch_raises(spark, tmp_path):
    """r11 (ADVICE r10): a second call with a different factor against
    an existing dst must raise, not mix scales silently."""
    import pytest

    dst = str(tmp_path / "sf_mix")
    ensure_scaled(spark, SF_SMOKE, dst, factor=2, tables=["documents"])
    with pytest.raises(ValueError, match="factor=2"):
        ensure_scaled(
            spark, SF_SMOKE, dst, factor=3, tables=["documents", "embeddings"]
        )
    assert _tables(dst) == {"documents"}  # nothing half-generated


def test_embeddings_factor_beyond_transform_period_raises(spark, tmp_path):
    """r11 (ADVICE r10): the rotate+flip transform has period 2·dim —
    copies k and k+2·dim would be exact twins, so the bound is
    enforced instead of trusted (callers max at factor=100 / dim 64)."""
    import pytest

    dst = str(tmp_path / "sf_twin")
    with pytest.raises(ValueError, match="exceeds the transform period"):
        ensure_scaled(
            spark, SF_SMOKE, dst, factor=129, tables=["embeddings"]
        )


def test_decorrelate_breaks_composition_twins(spark, tmp_path):
    """r11: rotations compose additively, so CHAINED generations
    (sf0.1→sf10→sf100) plant exact cross-copy twins — e.g. copies
    (k1,k2)=(0,1) and (1,0) share rotation 1 and even flip parity.
    decorrelate=True multiplies by a per-copy hash-sign diagonal
    (norm-preserving) so no two copies of the same base vector are
    identical, while leaving the default path byte-untouched."""
    import math

    mid = str(tmp_path / "mid")
    ensure_scaled(spark, SF_SMOKE, mid, factor=3, tables=["embeddings"])
    out = str(tmp_path / "out")
    ensure_scaled(spark, mid, out, factor=3, tables=["embeddings"],
                  decorrelate=True)

    import os

    from pyspark.sql import functions as F

    e = spark.read.parquet(os.path.join(out, "embeddings.parquet"))
    src = spark.read.parquet(
        os.path.join(SF_SMOKE, "embeddings.parquet")
    )
    n0 = src.count()
    assert e.count() == n0 * 9
    # exact-twin check across ALL 9 (k1,k2) copies of each base vector:
    # group by the base id (vec_id mod n0-stride universes collapse via
    # the offset scheme — base = vec_id % stride of the MID universe
    # isn't directly recoverable, so fingerprint the vector itself)
    twins = (
        e.groupBy(F.col("embedding").cast("array<double>").alias("v"))
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert twins == 0
    # norms preserved: total sum of squares matches 9× the source
    ss = lambda df: df.select(
        F.sum(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda a, x: a + x.cast("double") * x.cast("double"),
            )
        ).alias("s")
    ).first()["s"]
    assert math.isclose(ss(e), 9 * ss(src), rel_tol=1e-9)


def test_decorrelate_default_off_is_byte_identical(spark, tmp_path):
    """The existing benchdata lineage must stay reproducible: the
    default path's output is unchanged by the decorrelate feature."""
    import os

    a = str(tmp_path / "a")
    ensure_scaled(spark, SF_SMOKE, a, factor=2, tables=["embeddings"])
    b = str(tmp_path / "b")
    ensure_scaled(spark, SF_SMOKE, b, factor=2, tables=["embeddings"],
                  decorrelate=False)
    ea = spark.read.parquet(os.path.join(a, "embeddings.parquet"))
    eb = spark.read.parquet(os.path.join(b, "embeddings.parquet"))
    assert ea.exceptAll(eb).count() == 0 and eb.exceptAll(ea).count() == 0


def test_composed_marker_density_invariant(spark, tmp_path):
    """r12 (VERDICT r11 item 5): composing generations must NOT
    compound marker density — the old splice inserted zq<k2> between
    already-present zq<k1> markers, turning composed docs into ~50%
    marker tokens (a different shingle-statistics regime that
    CPU-bound the first sf100 dedup attempt). Marker-aware composition
    rewrites zq<k1> → zq<k1>x<k2>: density is invariant in generation
    depth UNDER THE DEDUP TOKENIZER ([a-z0-9]+ — an '_'-separated
    marker split into two tokens and leaked '<k2>' as a cross-copy
    shared token, restoring the shingle overlap the markers destroy:
    70 GB of sf100 shuffle vs 544 MB at sf10), copies stay pairwise
    marker-distinct, and single-generation output is byte-identical to
    the old splice."""
    import os

    from pyspark.sql import functions as F

    mid = str(tmp_path / "docs_mid")
    ensure_scaled(spark, SF_SMOKE, mid, factor=3, tables=["documents"])
    out = str(tmp_path / "docs_out")
    ensure_scaled(spark, mid, out, factor=3, tables=["documents"])

    # tokenize exactly like operators/dedup.tokens_col — the consumer
    # whose shingle statistics the markers exist to control
    tok = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

    def max_doc_marker_frac(path):
        d = spark.read.parquet(os.path.join(path, "documents.parquet"))
        toks = d.select("doc_id", F.explode(tok).alias("t"))
        per = toks.groupBy("doc_id").agg(
            (
                F.sum(
                    F.when(F.col("t").rlike(r"^zq[0-9x]+$"), 1).otherwise(0)
                )
                / F.count(F.lit(1))
            ).alias("f")
        )
        return per.agg(F.max("f")).first()[0]

    f_mid, f_out = max_doc_marker_frac(mid), max_doc_marker_frac(out)
    # one generation marks ~1 token in 3; the old compounding splice
    # drove twice-generated docs to ~5/9 marker tokens. No doc may
    # exceed the single-generation density.
    assert f_mid <= 0.45
    assert f_out <= f_mid * 1.05
    # composition must not change the TOKENIZED length of an already-
    # marked doc (rewrite-in-place): only the factor-1 copies of the
    # source's UNMARKED docs gain tokens (the fresh splice)
    mid_d = spark.read.parquet(os.path.join(mid, "documents.parquet"))
    n_unmarked_mid = mid_d.filter(~F.col("text").rlike(r"zq")).count()
    stride = mid_d.agg(F.max("doc_id")).first()[0] + 1
    out_d = spark.read.parquet(os.path.join(out, "documents.parquet"))
    grown = (
        out_d.select(
            (F.col("doc_id") % stride).alias("doc_id"),
            F.size(tok).alias("nt_out"),
        )
        .join(
            mid_d.select("doc_id", F.size(tok).alias("nt_mid")), "doc_id"
        )
        .filter(F.col("nt_out") != F.col("nt_mid"))
        .count()
    )
    assert grown == n_unmarked_mid * 2  # factor 3 → 2 fresh-spliced copies
    # composed markers carry both generation ids as ONE token
    d2 = out_d
    assert (
        d2.filter(F.col("text").rlike(r"(^|\s)zq[0-9]+x[0-9]+(\s|$)")).count()
        > 0
    )
    # copies of the same base doc remain pairwise distinct texts
    n0 = spark.read.parquet(
        os.path.join(SF_SMOKE, "documents.parquet")
    ).count()
    dup_texts = (
        d2.groupBy("text").count().filter(F.col("count") > 1).count()
    )
    assert d2.count() == 9 * n0
    assert dup_texts == 0
