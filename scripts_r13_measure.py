#!/usr/bin/env python
"""Isolated per-query timing for the r13 optimization round: noop-sink
wall times (min/median of N) with host steal stamps, one JSON line per
query. Complements bench.py (which times the whole headline set) by
letting a single query be re-measured quickly at any SF.

Usage: python scripts_r13_measure.py <runs> <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from dbt_project_spark import get_spark
from dbt_project_spark.catalog import QUERIES, load_all


def _host():
    try:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        with open("/proc/stat") as f:
            t = [int(x) for x in f.readline().split()[1:]]
        return load1, sum(t), t[7] if len(t) > 7 else 0
    except (OSError, ValueError, IndexError):
        return 0.0, 0, 0


def main() -> None:
    runs = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark(app_name="measure_r13")
    spark.sparkContext.setLogLevel("ERROR")
    # warm scan/agg + window codegen (the bench.py convention)
    QUERIES["tpch_q6"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    QUERIES["win_lag_delta"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    for name in names:
        samples, steals = [], []
        for i in range(runs):
            from dbt_project_spark.caching import reclaim_jvm

            reclaim_jvm()
            spark.sparkContext.setJobDescription(f"r13:{name}:{i}")
            l0, t0, s0 = _host()
            t = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.append(round(time.perf_counter() - t, 3))
            l1, t1, s1 = _host()
            steals.append(round(100.0 * (s1 - s0) / max(1, t1 - t0), 2))
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "median": round(statistics.median(samples), 3),
                    "min": min(samples),
                    "samples": samples,
                    "steal_pct": steals,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
