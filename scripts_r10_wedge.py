#!/usr/bin/env python
"""r10 quiet-window sf1 adjudication of the wedge-family watch
(VERDICT r09 task 1): triangle_count / clustering_coefficient /
lpa_communities / kcore_parts at sf1, median-of-3 interleaved, with
tpch_q21 as the frozen-plan control and /proc/loadavg sampled around
every run so the ledger self-adjudicates host noise."""
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from dbt_project_spark import get_spark
from dbt_project_spark.catalog import QUERIES, load_all
from dbt_project_spark.caching import reclaim_jvm

NAMES = [
    "tpch_q21",  # control: frozen plan, short
    "kcore_parts",
    "triangle_count",
    "clustering_coefficient",
    "lpa_communities",
]
SF1 = os.path.join(REPO, "benchdata", "sf1")


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main():
    load_all()
    spark = get_spark(app_name="r10-wedge")
    spark.sparkContext.setLogLevel("ERROR")
    # warm scan/window codegen at the sf1 data (bench.py convention)
    for w in ("tpch_q6", "win_lag_delta"):
        QUERIES[w](spark, SF1).write.mode("overwrite").format("noop").save()

    samples = {n: [] for n in NAMES}
    loads = {n: [] for n in NAMES}
    for p in range(3):
        reclaim_jvm()
        for name in NAMES:
            l0 = loadavg()
            t0 = time.perf_counter()
            QUERIES[name](sf_dir=SF1, spark=spark).write.mode(
                "overwrite"
            ).format("noop").save()
            dt = time.perf_counter() - t0
            l1 = loadavg()
            samples[name].append(round(dt, 2))
            loads[name].append([l0, l1])
            print(
                json.dumps(
                    {"pass": p, "q": name, "sec": round(dt, 2),
                     "load": [l0, l1]}
                ),
                flush=True,
            )
    out = {
        n: {
            "median": round(statistics.median(s), 2),
            "min": min(s),
            "max": max(s),
            "runs": s,
            "loads": loads[n],
        }
        for n, s in samples.items()
    }
    print("RESULT " + json.dumps(out), flush=True)
    with open(os.path.join(REPO, "wedge_r10.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
