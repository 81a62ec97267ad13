#!/usr/bin/env python
"""r12 sf100 re-run: the two VERDICT r11 tasks this round owes at the
empirical ceiling (5M docs / 2M vectors, one box):

1. The PQ-build kernel claim: r11 measured 682 s for the first
   ann_ivfpq_topk call at sf100 (per-subspace corpus re-reads +
   interpreted HOFs). The r12 fused encode kernel + shared training
   sample targets < 150 s train+encode. The build is timed EXPLICITLY
   here (force=True, fresh dirs), then serving warm.
2. The honest sf100 dedup chain: blocked in r11 by the sfgen
   documents-marker composition defect (composed docs ~50% marker
   tokens). With marker-aware composition (zq<k1>_<k2>) the chain is
   measured with shuffle + steal stamps, expecting ~linear scaling of
   the post-r10 shuffle shape (sf10: 544 MB class).

Chain layout mirrors scripts_r11_sf100.py (same REST stage API for
shuffle bytes, fresh index dirs, reclaim between steps).
Results → sf100_r12.json.
"""
import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from dbt_project_spark import get_spark
from dbt_project_spark.caching import reclaim_jvm, release_tracked
from dbt_project_spark.catalog import QUERIES, load_all
from dbt_project_spark.operators.ivf import ivf_index_dir
from dbt_project_spark.sfgen import ensure_scaled

PORT = 4049
CHAIN = [
    "ivf_build_index",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_refine",
    "pq_train_encode",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "corpus_keep_list",
    "dedup_semantic",
]


def steal():
    t = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return sum(t), t[7]


def stage_totals(app_id):
    url = (
        f"http://localhost:{PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    data = json.load(urllib.request.urlopen(url))
    return {
        "sw": sum(s.get("shuffleWriteBytes", 0) for s in data),
        "sr": sum(s.get("shuffleReadBytes", 0) for s in data),
        "inb": sum(s.get("inputBytes", 0) for s in data),
    }


def main():
    load_all()
    spark = get_spark(
        app_name="r12-sf100",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(PORT),
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    sf01 = "/root/testdata/sf0.1"
    sf10 = os.path.join(REPO, "benchdata", "sf10")
    sf100 = os.path.join(REPO, "benchdata", "sf100")
    t0 = time.perf_counter()
    ensure_scaled(
        spark, sf01, sf10, factor=100, tables=["documents", "embeddings"]
    )
    print(f"gen sf10: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    ensure_scaled(
        spark,
        sf10,
        sf100,
        factor=10,
        tables=["documents", "embeddings"],
        decorrelate=True,
    )
    print(f"gen sf100: {time.perf_counter() - t0:.1f}s", flush=True)
    results = {}
    from pyspark.sql import functions as F

    for t in ("documents", "embeddings"):
        n = spark.read.parquet(os.path.join(sf100, f"{t}.parquet")).count()
        results[f"sf100/{t}_rows"] = n
        print(f"sf100 {t}: {n} rows", flush=True)
    # marker-density stamp: the r11 defect's signature was composed
    # docs at ~50% marker tokens; the fix pins per-doc density at the
    # single-generation level (~1/3)
    d = spark.read.parquet(os.path.join(sf100, "documents.parquet"))
    toks = d.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("t")
    ).filter(F.length("t") > 0)
    per = toks.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("t").rlike(r"^zq[0-9_]+$"), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("f")
    )
    mx = per.agg(F.max("f")).first()[0]
    results["sf100/max_doc_marker_frac"] = round(float(mx), 4)
    print(f"sf100 max doc marker frac: {mx:.4f}", flush=True)

    shutil.rmtree(ivf_index_dir(sf100), ignore_errors=True)

    # Explicit PQ build timing (the r12 headline): coarse index first
    # (its own chain row times it too, but the PQ build must not pay
    # for it), then the raw-variant PQ train+encode, forced.
    from dbt_project_spark.operators.ivf import build_ivf_index, build_pq_index
    from dbt_project_spark.queries_vectors import PQ_ITERS, PQ_K, PQ_M

    build_ivf_index(spark, sf100)
    release_tracked()
    reclaim_jvm()
    st0 = stage_totals(app_id)
    tt0, sl0 = steal()
    w0 = time.perf_counter()
    spark.sparkContext.setJobDescription("r12: pq build (train+encode)")
    build_pq_index(spark, sf100, PQ_M, PQ_K, PQ_ITERS, force=True)
    wall = time.perf_counter() - w0
    tt1, sl1 = steal()
    st1 = stage_totals(app_id)
    release_tracked()
    results["sf100/pq_build_raw"] = {
        "wall": round(wall, 2),
        "steal_pct": round(100.0 * (sl1 - sl0) / max(1, tt1 - tt0), 3),
        "shuffle_write_mb": round((st1["sw"] - st0["sw"]) / 1e6, 1),
        "input_mb": round((st1["inb"] - st0["inb"]) / 1e6, 1),
    }
    print(json.dumps({"sf100/pq_build_raw": results["sf100/pq_build_raw"]}), flush=True)

    shutil.rmtree(ivf_index_dir(sf100), ignore_errors=True)
    for name in CHAIN:
        reclaim_jvm()
        st0 = stage_totals(app_id)
        tt0, sl0 = steal()
        w0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"r12:sf100:{name}")
        QUERIES[name](sf_dir=sf100, spark=spark).write.mode(
            "overwrite"
        ).format("noop").save()
        wall = time.perf_counter() - w0
        tt1, sl1 = steal()
        st1 = stage_totals(app_id)
        rec = {
            "wall": round(wall, 2),
            "steal_pct": round(100.0 * (sl1 - sl0) / max(1, tt1 - tt0), 3),
            "shuffle_write_mb": round((st1["sw"] - st0["sw"]) / 1e6, 1),
            "shuffle_read_mb": round((st1["sr"] - st0["sr"]) / 1e6, 1),
            "input_mb": round((st1["inb"] - st0["inb"]) / 1e6, 1),
        }
        results[f"sf100/{name}"] = rec
        print(json.dumps({f"sf100/{name}": rec}), flush=True)
        with open(os.path.join(REPO, "sf100_r12.json"), "w") as f:
            json.dump(results, f, indent=1)
    with open(os.path.join(REPO, "sf100_r12.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
