#!/usr/bin/env python
"""r11 sf100 ceiling push: the judge's standing caveat is that the
empirical scale ceiling is sf10 (500k docs / 200k vectors) on one box.
This generates benchdata/sf100 — 5M docs / 2M embeddings, 100× the
bench SF and 1000× the oracle SF — by composing a factor-10 generation
on top of benchdata/sf10 with decorrelate=True (per-copy hash-sign
diagonal; plain rotation composition would plant exact cross-copy
embedding twins — see sfgen._scaled_table), and measures the flagship
chains once:

- dedup: dedup_minhash_lsh → dedup_clusters → corpus_keep_list
  (expected ~linear: shuffle ≈ 10× the sf10 544-MB class)
- ANN:   ivf_build_index (K=2048 at n=2M — expected ~n via the r11
  kernel; the old interpreted n×K pass would have taken ~30 min) →
  ann_ivf_topk → ann_ivfpq_topk (first call pays PQ train+encode) →
  ann_ivfpq_refine (serving expected ~√n)

Same harness as scripts_r11_sf10.py (wall, steal, shuffle/input bytes
via the REST stage API; fresh index dirs). Results → sf100_r11.json.
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
# ANN first: the r11 build-kernel scaling claim (n=2M, K=2048) is the
# headline; the dedup trio follows (it rides 8 straggler row-group
# splits of the 4-file sf100 documents layout and takes far longer).
CHAIN = [
    "ivf_build_index",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_refine",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "corpus_keep_list",
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
        app_name="r11-sf100",
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
    print(f"gen sf100: {time.perf_counter() - t0:.1f}s", flush=True)
    for t in ("documents", "embeddings"):
        n = spark.read.parquet(os.path.join(sf100, f"{t}.parquet")).count()
        print(f"sf100 {t}: {n} rows", flush=True)

    results = {}
    shutil.rmtree(ivf_index_dir(sf100), ignore_errors=True)
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
        with open(os.path.join(REPO, "sf100_r11.json"), "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
