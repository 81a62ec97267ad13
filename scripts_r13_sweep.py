#!/usr/bin/env python
"""One-pass wall-time sweep of EVERY registered catalog query at the
given SF (r13 audit: the bench times only 78 of 332 — knn_langid_eval
hid at 10.5 s sf0.1 / 333 s sf1 until this round's sweep caught it).
Single run each, noop sink, reclaim between queries, steal stamps.
Prints one JSON line per query plus a sorted tail summary.

Usage: python scripts_r13_sweep.py [skip_substring ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from dbt_project_spark import get_spark
from dbt_project_spark.catalog import QUERIES, load_all


def _steal():
    try:
        t = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return sum(t), t[7] if len(t) > 7 else 0
    except (OSError, ValueError):
        return 0, 0


def main() -> None:
    skips = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark(app_name="sweep_r13")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["tpch_q6"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    QUERIES["win_lag_delta"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    from dbt_project_spark.caching import reclaim_jvm

    out = {}
    for i, (name, fn) in enumerate(sorted(QUERIES.items())):
        if any(s in name for s in skips):
            continue
        if i % 25 == 0:
            reclaim_jvm()
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0c, s0 = _steal()
        t = time.perf_counter()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            wall = round(time.perf_counter() - t, 3)
        except Exception as e:  # noqa: BLE001
            wall = None
            print(json.dumps({"query": name, "error": f"{type(e).__name__}: {e}"[:200]}), flush=True)
            continue
        t1c, s1 = _steal()
        steal = round(100.0 * (s1 - s0) / max(t1c - t0c, 1), 2)
        out[name] = wall
        print(json.dumps({"query": name, "wall": wall, "steal_pct": steal}), flush=True)
    top = sorted(out.items(), key=lambda kv: -kv[1])[:25]
    print("SLOWEST25 " + json.dumps(top), flush=True)


if __name__ == "__main__":
    main()
