#!/usr/bin/env python
"""r11 sf10 re-measurement (VERDICT r10 tasks 3 + 4).

Re-runs the r10 scale-proof chains against the r11 tree so the repo's
own ledger carries POST-fix numbers:

- dedup chain (dedup_minhash_lsh → dedup_clusters → corpus_keep_list):
  r10's candidate-local verify_jaccard fix landed after sf10_r10.json
  was recorded, so that artifact shows the pre-fix 1802 MB shuffles;
  this run pins the 545-MB-class post-fix chain (task 4).
- ANN chain (ivf_build_index → ann_ivf_topk → ann_ivfpq_topk →
  ann_ivfpq_refine): the r11 two-stage exact assignment replaces the
  interpreted n×K pass — done-criterion is sf10 build < 100 s at
  unchanged assignments (task 3; r10 pre-fix: 170.5 s).

Same measurement harness as scripts_r10_sf10.py (wall, CPU steal,
shuffle/input bytes via the REST stage API; index dirs wiped first so
every build pays full cost like the r10 run did on fresh dirs).
Results land in sf10_r11.json and the SCALE.md r11 ledger.
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
from dbt_project_spark.catalog import QUERIES, load_all
from dbt_project_spark.caching import reclaim_jvm
from dbt_project_spark.operators.ivf import ivf_index_dir
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
    }


def main():
    load_all()
    spark = get_spark(
        app_name="r11-sf10",
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
    ensure_scaled(
        spark,
        "/root/testdata/sf0.1",
        sf10,
        factor=100,
        tables=["documents", "embeddings"],
    )

    results = {}
    for sf_name, sf_dir, passes in (("sf1", sf1, 2), ("sf10", sf10, 1)):
        # fresh index dirs: every build pays full cost (r10 parity)
        shutil.rmtree(ivf_index_dir(sf_dir), ignore_errors=True)
        for name in DEDUP + ANN:
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
    with open(os.path.join(REPO, "sf10_r11.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
