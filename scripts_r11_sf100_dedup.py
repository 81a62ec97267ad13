#!/usr/bin/env python
"""r11 sf100 dedup-chain measurement (continuation of
scripts_r11_sf100.py after the n_files floor fix — the first
generation packed 5M docs into 4 files, leaving ~8 real row-group
splits to carry every scan; regenerated at 40 files). Merges its rows
into sf100_r11.json next to the ANN-chain rows."""
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
CHAIN = ["dedup_minhash_lsh", "dedup_clusters", "corpus_keep_list"]


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
        app_name="r11-sf100-dedup",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(PORT),
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    sf10 = os.path.join(REPO, "benchdata", "sf10")
    sf100 = os.path.join(REPO, "benchdata", "sf100")
    t0 = time.perf_counter()
    ensure_scaled(
        spark,
        sf10,
        sf100,
        factor=10,
        tables=["documents", "embeddings"],
        decorrelate=True,
    )
    print(f"regen docs: {time.perf_counter() - t0:.1f}s", flush=True)

    art = os.path.join(REPO, "sf100_r11.json")
    results = {}
    if os.path.exists(art):
        with open(art) as f:
            results = json.load(f)
    for name in CHAIN:
        reclaim_jvm()
        st0 = stage_totals(app_id)
        tt0, sl0 = steal()
        w0 = time.perf_counter()
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
        with open(art, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
