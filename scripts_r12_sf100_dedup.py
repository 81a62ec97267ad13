#!/usr/bin/env python
"""r12 sf100 dedup chain only (fresh session; the ANN half is already
recorded). Appends to sf100_r12.json."""
import json, os, shutil, sys, time, urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
from dbt_project_spark import get_spark
from dbt_project_spark.caching import reclaim_jvm
from dbt_project_spark.catalog import QUERIES, load_all

PORT = 4049
CHAIN = ["dedup_minhash_lsh", "dedup_clusters", "corpus_keep_list", "dedup_semantic"]

def steal():
    t = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return sum(t), t[7]

def stage_totals(app_id):
    url = f"http://localhost:{PORT}/api/v1/applications/{app_id}/stages?status=complete"
    data = json.load(urllib.request.urlopen(url))
    return {
        "sw": sum(s.get("shuffleWriteBytes", 0) for s in data),
        "sr": sum(s.get("shuffleReadBytes", 0) for s in data),
        "inb": sum(s.get("inputBytes", 0) for s in data),
    }

def main():
    load_all()
    spark = get_spark(app_name="r12-sf100-dedup", extra_conf={
        "spark.ui.enabled": "true", "spark.ui.port": str(PORT),
        "spark.ui.retainedStages": "100000", "spark.ui.retainedJobs": "100000"})
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    sf100 = os.path.join(REPO, "benchdata", "sf100")
    out_path = os.path.join(REPO, "sf100_r12.json")
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    for name in CHAIN:
        reclaim_jvm()
        st0 = stage_totals(app_id); tt0, sl0 = steal(); w0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"r12:sf100:{name}")
        QUERIES[name](sf_dir=sf100, spark=spark).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - w0
        tt1, sl1 = steal(); st1 = stage_totals(app_id)
        rec = {"wall": round(wall, 2),
               "steal_pct": round(100.0 * (sl1 - sl0) / max(1, tt1 - tt0), 3),
               "shuffle_write_mb": round((st1["sw"] - st0["sw"]) / 1e6, 1),
               "shuffle_read_mb": round((st1["sr"] - st0["sr"]) / 1e6, 1),
               "input_mb": round((st1["inb"] - st0["inb"]) / 1e6, 1)}
        results[f"sf100/{name}"] = rec
        print(json.dumps({f"sf100/{name}": rec}), flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)

if __name__ == "__main__":
    main()
