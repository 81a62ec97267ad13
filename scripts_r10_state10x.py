#!/usr/bin/env python
"""r10 streaming-state measurement at 25× the r09 group count
(VERDICT r09 task 5): the production update-mode topology WITH
watermark eviction over sf0.1 events keyed by RAW user_id — 999,150
distinct (5-min window, key) groups vs r09's 38,913 (the earlier
event_type × user_id%10 keying drafted for this script yielded only
~389k; the raw-user_id keying in main() is what ran and what
state10x_r10.json records) — asserting live state plateaus at the
watermark horizon."""
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from dbt_project_spark import get_spark
from dbt_project_spark.sources import load_table
from dbt_project_spark.streaming.update_dist import (
    _latest_version,
    run_update_distribution,
)


def main():
    spark = get_spark(app_name="r10-state10x")
    spark.sparkContext.setLogLevel("ERROR")
    # sf1 events (1M rows, 30 days) keyed by (event_type × RAW
    # user_id): 999,150 distinct (5-min window, key) groups ≈ 25× the
    # r09 parity measurement's 38,913 — the per-user-metrics topology.
    # (Modulo splits saturate: sessions make per-window distinct users
    # the binding cap — %10 measured 89k groups, %100 only 99k.)
    events = load_table(
        spark, os.path.join(REPO, "benchdata", "sf1"), "events"
    ).select(
        "ts",
        F.concat("event_type", F.lit("_"), "user_id").alias("k"),
    )
    tmp = tempfile.mkdtemp(prefix="state10x_")
    try:
        src = os.path.join(tmp, "src")
        # Write the 16 time slices SEQUENTIALLY (one job each): the
        # file stream orders by mtime, and a single multi-file write
        # job finishes its tasks in arbitrary order — an out-of-order
        # slice would advance the watermark early and drop late data.
        lo, hi = events.agg(
            F.min("ts").cast("long"), F.max("ts").cast("long")
        ).collect()[0]
        step = (hi - lo) // 16 + 1
        for i in range(16):
            sl = events.filter(
                (F.col("ts").cast("long") >= lo + i * step)
                & (F.col("ts").cast("long") < lo + (i + 1) * step)
            )
            sl.coalesce(1).write.mode("append").parquet(src)
        progress = run_update_distribution(
            spark,
            src,
            state_dir=os.path.join(tmp, "state"),
            out_dir=os.path.join(tmp, "out"),
            checkpoint_dir=os.path.join(tmp, "ckpt"),
            width_sec=300,
            key_col="k",
            watermark="60 minutes",
        )
        series = [
            op["numRowsTotal"]
            for p in progress
            for op in p.get("stateOperators", [])
        ]
        removed = sum(
            op.get("numRowsRemoved", 0)
            for p in progress
            for op in p.get("stateOperators", [])
        )
        v = _latest_version(os.path.join(tmp, "state"))
        total_groups = spark.read.parquet(
            os.path.join(tmp, "state", f"v{v}")
        ).count()
        out = {
            "total_groups": total_groups,
            "state_rows_per_trigger": series,
            "rows_removed_total": removed,
            "plateau_max_mid": max(series[2:-1]) if len(series) > 3 else None,
        }
        print("RESULT " + json.dumps(out), flush=True)
        with open(os.path.join(REPO, "state10x_r10.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
