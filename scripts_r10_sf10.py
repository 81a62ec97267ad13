#!/usr/bin/env python
"""r10 sf10 scale-proof (VERDICT r09 task 3).

Generates benchdata/sf10 (documents + embeddings only, 100× sf0.1 via
sfgen key-offset replication) and runs the flagship LLM-pipeline
chains at sf1 AND sf10, recording wall clock, CPU steal, and shuffle
read/write bytes per step (Spark REST status API):

- dedup chain: dedup_minhash_lsh → dedup_clusters → corpus_keep_list
- ANN chain:   ivf_build_index → ann_ivf_topk → ann_ivfpq_topk
               (first call = PQ train+encode build) → ann_ivfpq_refine

Every design note predicts ~linear scaling for the dedup chain and
n·K (≈ n^1.5) for the one-time IVF/PQ build with sublinear serving;
this script measures it once. Results land in sf10_r10.json and the
SCALE.md r10 ledger.
"""
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from dbt_project_spark import get_spark
from dbt_project_spark.catalog import QUERIES, load_all
from dbt_project_spark.caching import reclaim_jvm
from dbt_project_spark.sfgen import ensure_scaled

PORT = 4049
DEDUP = ["dedup_minhash_lsh", "dedup_clusters", "corpus_keep_list"]
ANN = ["ivf_build_index", "ann_ivf_topk", "ann_ivfpq_topk", "ann_ivfpq_refine"]


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
        "peak_sw_stage": max(
            (s.get("shuffleWriteBytes", 0) for s in data), default=0
        ),
    }


def main():
    load_all()
    spark = get_spark(
        app_name="r10-sf10",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(PORT),
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    sf1 = os.path.join(REPO, "benchdata", "sf1")
    sf10 = os.path.join(REPO, "benchdata", "sf10")
    t0 = time.perf_counter()
    ensure_scaled(
        spark,
        "/root/testdata/sf0.1",
        sf10,
        factor=100,
        tables=["documents", "embeddings"],
    )
    print(f"gen sf10: {time.perf_counter()-t0:.1f}s", flush=True)
    for t in ("documents", "embeddings"):
        n = spark.read.parquet(os.path.join(sf10, f"{t}.parquet")).count()
        print(f"sf10 {t}: {n} rows", flush=True)

    results = {}
    for sf_name, sf_dir, passes in (("sf1", sf1, 2), ("sf10", sf10, 1)):
        for name in DEDUP + ANN:
            walls = []
            for p in range(passes):
                reclaim_jvm()
                st0 = stage_totals(app_id)
                tt0, sl0 = steal()
                w0 = time.perf_counter()
                QUERIES[name](sf_dir=sf_dir, spark=spark).write.mode(
                    "overwrite"
                ).format("noop").save()
                wall = time.perf_counter() - w0
                tt1, sl1 = steal()
                st1 = stage_totals(app_id)
                walls.append(round(wall, 2))
                rec = {
                    "wall": round(wall, 2),
                    "steal_pct": round(
                        100.0 * (sl1 - sl0) / max(1, tt1 - tt0), 3
                    ),
                    "shuffle_write_mb": round(
                        (st1["sw"] - st0["sw"]) / 1e6, 1
                    ),
                    "shuffle_read_mb": round((st1["sr"] - st0["sr"]) / 1e6, 1),
                    "input_mb": round((st1["inb"] - st0["inb"]) / 1e6, 1),
                }
                results[f"{sf_name}/{name}/p{p}"] = rec
                print(json.dumps({f"{sf_name}/{name}/p{p}": rec}), flush=True)
    with open(os.path.join(REPO, "sf10_r10.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
