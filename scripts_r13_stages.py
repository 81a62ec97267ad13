#!/usr/bin/env python
"""Per-stage breakdown for one catalog query (r13 measurement): runs
the query once with the UI enabled and dumps completed stages sorted
by executorRunTime (name, run time, shuffle read/write, input bytes).

Usage: python scripts_r13_stages.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from dbt_project_spark import get_spark
from dbt_project_spark.catalog import QUERIES, load_all

PORT = 4048


def stages(app_id):
    url = (
        f"http://localhost:{PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    return json.load(urllib.request.urlopen(url))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark(
        app_name="stages_r13",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(PORT),
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    # warm codegen (subset-generated dirs lack TPC-H tables)
    try:
        QUERIES["tpch_q6"](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
    except Exception:
        QUERIES["dedup_exact"](spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()
    for name in names:
        seen = {s["stageId"] for s in stages(app_id)}
        spark.sparkContext.setJobDescription(f"stages:{name}")
        t = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        wall = time.perf_counter() - t
        new = [s for s in stages(app_id) if s["stageId"] not in seen]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        total_rt = sum(s.get("executorRunTime", 0) for s in new)
        print(f"\n=== {name}  wall {wall:.2f}s  stages {len(new)}  "
              f"sum executorRunTime {total_rt/1000:.1f}s")
        for s in new[:20]:
            print(
                f"  st{s['stageId']:<5} rt {s.get('executorRunTime',0)/1000:7.2f}s"
                f" tasks {s.get('numCompleteTasks',0):4}"
                f" in {s.get('inputBytes',0)/1e6:8.1f}MB"
                f" sr {s.get('shuffleReadBytes',0)/1e6:8.1f}MB"
                f" sw {s.get('shuffleWriteBytes',0)/1e6:8.1f}MB"
                f"  {s.get('name','')[:70]}"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
