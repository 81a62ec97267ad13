"""The r11 numpy assign_clusters kernel (operators/kmeans.py) must be
bit-identical to the old crossJoin + min_by(d2·M + cid) SQL pass —
including cid ties, ragged/null vectors (null key semantics), and the
2⁵³ exact-float64 guard that routes huge components to the python-int
slow path."""

from pyspark.sql import functions as F

from dbt_project_spark.operators.kmeans import (
    _d2_key,
    assign_clusters,
)


def _sql_reference(iv, cent):
    """The pre-r11 assignment, verbatim."""
    scored = iv.crossJoin(F.broadcast(cent)).withColumn("key", _d2_key())
    return scored.groupBy("vid").agg(
        F.min_by("cid", F.col("key")).alias("cid")
    )


def _rows(df):
    return {
        (r["vid"], None if r["cid"] is None else int(r["cid"]))
        for r in df.collect()
    }


def _dfs(spark, vec_rows, cent_rows):
    iv = spark.createDataFrame(vec_rows, "vid bigint, iv array<bigint>")
    cent = spark.createDataFrame(cent_rows, "cid bigint, civ array<bigint>")
    return iv, cent


def test_assign_kernel_matches_sql_with_ties(spark):
    import random

    rng = random.Random(3)
    cent_rows = [
        (c, [rng.randrange(-(10**6), 10**6) for _ in range(8)])
        for c in range(16)
    ]
    vec_rows = [
        (i, [rng.randrange(-(10**6), 10**6) for _ in range(8)])
        for i in range(200)
    ]
    # exact duplicates of centroids 0 and 5 (d2 = 0) and a duplicated
    # CENTROID pair (cid 14 == cid 15): tie must break to the lower cid
    cent_rows[15] = (15, list(cent_rows[14][1]))
    vec_rows += [(200, list(cent_rows[0][1])), (201, list(cent_rows[5][1])),
                 (202, list(cent_rows[14][1]))]
    iv, cent = _dfs(spark, vec_rows, cent_rows)
    got = _rows(assign_clusters(iv, cent))
    assert got == _rows(_sql_reference(iv, cent))
    assert (202, 14) in got  # duplicated centroids: lowest cid wins


def test_assign_kernel_matches_sql_on_ragged_and_null(spark):
    cent_rows = [(0, [0, 0, 0]), (1, [10, 10, 10])]
    vec_rows = [
        (0, [1, 1, 1]),       # normal
        (1, [9, 9, 9, 9]),    # ragged (longer): every key null
        (2, [5, 5]),          # ragged (shorter): every key null
        (3, None),            # null vector
        (4, [11, 11, 11]),    # normal
    ]
    iv, cent = _dfs(spark, vec_rows, cent_rows)
    got = _rows(assign_clusters(iv, cent))
    assert got == _rows(_sql_reference(iv, cent))
    assert (0, 0) in got and (4, 1) in got
    assert {(1, None), (2, None), (3, None)} <= got


def test_assign_kernel_bigint_guard_slow_path(spark):
    """Components past √(2⁵³/dim)/2 break float64 exactness — the
    squares alone exceed 2⁵³, so the xsq + csq − 2x·c decomposition
    carries cancellation noise of ~hundreds while the true d2 gap
    here is 3. The kernel must detect the bound and take the
    python-int slow path, matching the DECIMAL(38,0) SQL result."""
    big = 4 * 10**8  # > safe_mx ≈ 5.3e7 at dim 4
    cent_rows = [(0, [big, -big, big, -big]), (1, [big - 3, -big, big, -big])]
    vec_rows = [(0, [big - 2, -big, big, -big]), (1, [-big, big, -big, big])]
    iv, cent = _dfs(spark, vec_rows, cent_rows)
    got = _rows(assign_clusters(iv, cent))
    assert got == _rows(_sql_reference(iv, cent))
    assert (0, 1) in got  # true d2: 1 vs 4 — inside the noise band
