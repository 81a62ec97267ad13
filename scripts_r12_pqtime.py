#!/usr/bin/env python
"""Time the PQ-family build + serving paths (r12 before/after
evidence). Forces a fresh PQ index (both variants), then times:

- build_pq_index raw + residual (cold, the sf100-exposed constant)
- pq_train_encode / ann_ivfpq_topk / ann_ivfpq_refine /
  ann_ivfpq_residual_topk end-to-end via the noop sink (warm index)
- dedup_embedding / dedup_embedding_strict / dedup_semantic /
  semantic_threshold_sweep (the cosine-verify family)

Usage: python scripts_r12_pqtime.py <sf_dir> [<tag>]
Prints one JSON line; steal/load stamps included.
"""

from __future__ import annotations

import json
import os
import shutil
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
    except Exception:
        return 0.0, 0, 0


def main() -> None:
    sf_dir = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else "run"
    load_all()
    spark = get_spark(app_name=f"pqtime_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    from dbt_project_spark.caching import reclaim_jvm, release_tracked
    from dbt_project_spark.operators.ivf import (
        build_ivf_index,
        build_pq_index,
        ivf_index_dir,
    )
    from dbt_project_spark.queries_vectors import PQ_ITERS, PQ_K, PQ_M

    out: dict = {"tag": tag, "sf_dir": sf_dir, "times": {}}

    # coarse index warm (not timed here; ivf_build_index owns it)
    build_ivf_index(spark, sf_dir)
    release_tracked()

    for name, residual in (("pq_build_raw", False), ("pq_build_residual", True)):
        shutil.rmtree(
            os.path.join(
                ivf_index_dir(sf_dir),
                "pq_residual" if residual else "pq_raw",
            ),
            ignore_errors=True,
        )
        reclaim_jvm()
        l0, t0, s0 = _host()
        w0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"r12:{name}")
        build_pq_index(
            spark, sf_dir, PQ_M, PQ_K, PQ_ITERS, residual=residual, force=True
        )
        dt = time.perf_counter() - w0
        l1, t1, s1 = _host()
        release_tracked()
        out["times"][name] = {
            "sec": round(dt, 3),
            "steal_pct": round(100.0 * (s1 - s0) / max(1, t1 - t0), 2),
            "load": max(l0, l1),
        }

    for name in (
        "pq_train_encode",
        "ann_ivfpq_topk",
        "ann_ivfpq_refine",
        "ann_ivfpq_residual_topk",
        "dedup_embedding",
        "dedup_embedding_strict",
        "dedup_semantic",
        "semantic_threshold_sweep",
    ):
        samples = []
        host = {"steal_pct": 0.0, "load": 0.0}
        for _ in range(2):
            reclaim_jvm()
            l0, t0, s0 = _host()
            w0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"r12:{name}")
            QUERIES[name](sf_dir=sf_dir, spark=spark).write.mode(
                "overwrite"
            ).format("noop").save()
            samples.append(round(time.perf_counter() - w0, 3))
            l1, t1, s1 = _host()
            host["steal_pct"] = max(
                host["steal_pct"],
                round(100.0 * (s1 - s0) / max(1, t1 - t0), 2),
            )
            host["load"] = max(host["load"], l0, l1)
        out["times"][name] = {"sec": min(samples), "samples": samples, **host}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
