#!/usr/bin/env python
"""Capture .explain('formatted') for named catalog queries into
plans/r13/<query>_<tag>.txt (the r13 optimization-round evidence:
judge checks plan claims against these files).

Usage: python scripts_r13_plans.py <tag> <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from dbt_project_spark import get_spark
from dbt_project_spark.catalog import QUERIES, load_all


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    load_all()
    spark = get_spark(app_name="plans_r13")
    spark.sparkContext.setLogLevel("ERROR")
    # the engine caps plan rendering at 64 KiB (session.py); evidence
    # files must be complete — match the test harness's 8 MiB cap
    spark.conf.set("spark.sql.maxPlanStringLength", str(8 * 1024 * 1024))
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} B)")


if __name__ == "__main__":
    main()
