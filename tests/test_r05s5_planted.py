"""Planted-semantics tests for the r5s5 additions: the winnowing
guarantee (any shared passage of >= K+W-1 tokens yields a shared
fingerprint, at any offset), winnowing density, and Kendall tau sign
behavior on fully concordant / fully reversed rankings."""

from pyspark.sql import functions as F


def _write(spark, path, name, data, schema):
    spark.createDataFrame(data, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(path / f"{name}.parquet"))


def _docs(spark, path, rows):
    _write(
        spark,
        path,
        "documents",
        [(int(i), t, "en", "src0", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )


def test_winnowing_shared_passage_guarantee(spark, tmp_path):
    """K=4, W=5: a shared run of K+W-1=8 tokens guarantees >= 1 shared
    fingerprint hash in BOTH docs, regardless of the offset at which
    each doc contains it (shift invariance)."""
    from dbt_project_spark.queries_dedup import winnowing_fingerprints

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    d1 = "aa1 bb2 cc3 " + shared + " dd4 ee5 ff6 gg7 hh8"
    d2 = "xx1 yy2 zz3 ww4 vv5 uu6 tt7 " + shared
    d3 = " ".join(f"unique{i}word" for i in range(30))
    _docs(spark, tmp_path, [(1, d1), (2, d2), (3, d3)])
    r = {
        x["doc_id"]: x
        for x in winnowing_fingerprints(spark, str(tmp_path)).collect()
    }
    assert r[1]["n_shared_fp"] >= 1
    assert r[2]["n_shared_fp"] >= 1
    assert r[3]["n_shared_fp"] == 0
    for i in (1, 2, 3):
        assert r[i]["n_kgrams"] == r[i]["n_tokens"] - 3
        assert 1 <= r[i]["n_fp_positions"] <= r[i]["n_kgrams"]
        assert r[i]["n_fp_hashes"] <= r[i]["n_fp_positions"]


def test_winnowing_short_doc_zero_fingerprints(spark, tmp_path):
    """Docs with fewer than K tokens have no k-grams; docs with fewer
    than K+W-1 tokens have no FULL window and select nothing."""
    from dbt_project_spark.queries_dedup import winnowing_fingerprints

    _docs(
        spark,
        tmp_path,
        [(1, "one two three"), (2, "one two three four five six seven")],
    )
    r = {
        x["doc_id"]: x
        for x in winnowing_fingerprints(spark, str(tmp_path)).collect()
    }
    assert r[1]["n_kgrams"] == 0 and r[1]["n_fp_positions"] == 0
    # 7 tokens -> 4 kgrams < W=5 windows -> no full window
    assert r[2]["n_kgrams"] == 4 and r[2]["n_fp_positions"] == 0
    assert r[2]["density_micro"] == 0


def test_winnowing_density_near_theoretical(spark, tmp_path):
    """Expected selection density is 2/(W+1) = 1/3 of k-grams; a long
    mixed doc should land in a broad band around it."""
    from dbt_project_spark.queries_dedup import winnowing_fingerprints

    text = " ".join(f"tok{(7 * i * i + 3 * i) % 997}x" for i in range(400))
    _docs(spark, tmp_path, [(1, text)])
    row = winnowing_fingerprints(spark, str(tmp_path)).collect()[0]
    assert 150_000 <= row["density_micro"] <= 650_000


def _retrieval_tables(spark, tmp_path, reverse_vectors):
    # BM25 relevance strictly decreasing doc 1 > 2 > 3 for the fixed
    # query terms (dup, vector, merge); equal doc lengths.
    _docs(
        spark,
        tmp_path,
        [
            (0, "queryplaceholder text here now"),
            (1, "dup vector merge dup vector merge dup vector merge"),
            (2, "dup vector merge pad1 pad2 pad3 pad4 pad5 pad6"),
            (3, "dup pada padb padc padd pade padf padg padh"),
        ],
    )
    qv = [1.0, 0.0, 0.0, 0.0]
    order = [1, 2, 3] if not reverse_vectors else [3, 2, 1]
    cos = {order[0]: 0.9, order[1]: 0.5, order[2]: 0.1}
    import math

    def vec(c):
        return [float(c), math.sqrt(1.0 - c * c), 0.0, 0.0]

    _write(
        spark,
        tmp_path,
        "embeddings",
        [(0, qv, 0)] + [(i, vec(cos[i]), 0) for i in (1, 2, 3)],
        "vec_id bigint, embedding array<float>, label int",
    )


def test_kendall_tau_fully_concordant(spark, tmp_path):
    from dbt_project_spark.queries_retrieval import ranker_kendall_tau

    _retrieval_tables(spark, tmp_path, reverse_vectors=False)
    row = ranker_kendall_tau(spark, str(tmp_path)).collect()[0]
    assert row["n_common"] == 3 and row["n_pairs"] == 3
    assert row["concordant"] == 3 and row["discordant"] == 0
    assert row["tau_micro"] == 1_000_000


def test_kendall_tau_fully_reversed(spark, tmp_path):
    from dbt_project_spark.queries_retrieval import ranker_kendall_tau

    _retrieval_tables(spark, tmp_path, reverse_vectors=True)
    row = ranker_kendall_tau(spark, str(tmp_path)).collect()[0]
    assert row["concordant"] == 0 and row["discordant"] == 3
    assert row["tau_micro"] == -1_000_000


# ---------------------------------------------------------------------------
# r5s5 batch 2: temperature mix, DiD, pack waste, Simpson, power/MDE
# ---------------------------------------------------------------------------

import hashlib
import math


def _arm(uid):
    return "T" if int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2 == 0 else "C"


def _write_events(spark, path, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [(int(e), ts, int(u), t, float(v), "{}") for e, ts, u, t, v in rows],
        "event_id bigint, __ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("__ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(path / "events.parquet"))


def test_temperature_mix_sqrt_flattening(spark, tmp_path):
    """Sources with 4 and 16 tokens: natural shares 1/5 vs 4/5 flatten
    to sqrt shares 1/3 vs 2/3; the small source is boosted 5/3x."""
    from dbt_project_spark.queries_training import source_temperature_mix

    _write(
        spark,
        tmp_path,
        "documents",
        [
            (1, "a b c d", "en", "small", 7),
            (2, " ".join(f"w{i}" for i in range(16)), "en", "big", 60),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    r = {
        x["source"]: x
        for x in source_temperature_mix(spark, str(tmp_path)).collect()
    }
    assert r["small"]["p_micro"] == 200_000
    assert r["small"]["q_micro"] == 333_333
    assert r["small"]["boost_micro"] == 1_666_666
    assert r["big"]["p_micro"] == 800_000
    assert r["big"]["q_micro"] == 666_666
    assert r["big"]["boost_micro"] == 833_333


def test_did_planted_effect(spark, tmp_path):
    """T: 1.0 pre -> 3.0 post; C: 1.0 pre -> 2.0 post; DiD = +1.0."""
    from dbt_project_spark.queries_product import did_estimator

    t_users = [u for u in range(1, 40) if _arm(u) == "T"][:3]
    c_users = [u for u in range(1, 40) if _arm(u) == "C"][:3]
    rows, eid = [], 0
    for u in t_users:
        for ts, v in (("2024-01-05 12:00:00", 1.0), ("2024-01-20 12:00:00", 3.0)):
            eid += 1
            rows.append((eid, ts, u, "purchase", v))
    for u in c_users:
        for ts, v in (("2024-01-05 12:00:00", 1.0), ("2024-01-20 12:00:00", 2.0)):
            eid += 1
            rows.append((eid, ts, u, "purchase", v))
    _write_events(spark, tmp_path, rows)
    row = did_estimator(spark, str(tmp_path)).collect()[0]
    assert row["mean_t_pre_micro"] == 1_000_000
    assert row["mean_t_post_micro"] == 3_000_000
    assert row["mean_c_post_micro"] == 2_000_000
    assert row["did_micro"] == 1_000_000


def test_pack_waste_planted(spark, tmp_path):
    """Docs of 3 and 5 tokens: at budget 64 each doc is one padded
    chunk (waste 120/128); packing collapses both into one chunk."""
    from dbt_project_spark.queries_training import pack_padding_waste_sweep

    _write(
        spark,
        tmp_path,
        "documents",
        [
            (1, "a b c", "en", "s", 5),
            (2, "d e f g h", "en", "s", 9),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    r = {
        x["budget"]: x
        for x in pack_padding_waste_sweep(spark, str(tmp_path)).collect()
    }
    b = r[64]
    assert b["total_tokens"] == 8 and b["padded_chunks"] == 2
    assert b["waste_tokens"] == 2 * 64 - 8
    assert b["waste_micro"] == (2 * 64 - 8) * 1_000_000 // (2 * 64)
    assert b["packed_chunks"] == 1
    assert b["packing_gain_micro"] == 500_000


def test_simpson_reversal_planted(spark, tmp_path):
    """Each stratum trends DOWN with hour; the pooled line trends UP
    (strata offset along x and y) — the classic reversal."""
    from dbt_project_spark.queries_quality import simpson_slope_reversal

    rows = [
        (1, "2024-01-05 00:30:00", 1, "A", 0.10),
        (2, "2024-01-05 01:30:00", 1, "A", 0.09),
        (3, "2024-01-05 10:30:00", 2, "B", 0.30),
        (4, "2024-01-05 11:30:00", 2, "B", 0.29),
    ]
    _write_events(spark, tmp_path, rows)
    r = {
        x["event_type"]: x
        for x in simpson_slope_reversal(spark, str(tmp_path)).collect()
    }
    assert r["A"]["slope_micro"] < 0 and r["B"]["slope_micro"] < 0
    assert r["ALL"]["pooled_slope_micro"] > 0
    assert r["A"]["sign_flip"] == 1 and r["B"]["sign_flip"] == 1
    assert r["ALL"]["sign_flip"] == 0


def test_ab_power_mde_matches_formula(spark, tmp_path):
    """MDE and required-n reproduce the closed-form on a planted
    population (expected values computed with the same integer/IEEE
    steps the query documents)."""
    from dbt_project_spark.queries_product import ab_power_mde

    # 40 users, ~half converting: conversion = spend >= 3300.
    rows = []
    eid = 0
    for u in range(1, 41):
        eid += 1
        rows.append((eid, "2024-01-10 10:00:00", u, "purchase",
                     5000.0 if u % 2 == 0 else 10.0))
    _write_events(spark, tmp_path, rows)
    out = {x["arm"]: x for x in ab_power_mde(spark, str(tmp_path)).collect()}
    nn = sum(x["n_users"] for x in out.values())
    cc = sum(x["n_conv"] for x in out.values())
    assert nn == 40 and cc == 20
    for arm, row in out.items():
        n = row["n_users"]
        v = (2 * cc * (nn - cc)) / (nn * nn * n)
        assert row["mde_abs_micro"] == math.floor(math.sqrt(v) * 2_801_585)
        z2 = 2_801_585 * 2_801_585
        t2 = 10_000 * 10_000
        assert row["n_req_1pct"] == -(-(z2 * 2 * cc * (nn - cc)) // (t2 * nn * nn))
