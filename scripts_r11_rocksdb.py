#!/usr/bin/env python
"""r11 streaming-state plateau on the RocksDB provider (VERDICT r10
task 7): same topology and data as scripts_r10_state10x.py — sf1
events keyed by event_type × raw user_id, 999,150 distinct (5-min
window, key) groups over 16 sequential file-stream slices, 60-min
watermark — but with
spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider
(the 100×-scale provider: state spills to local SST files instead of
living on the executor heap; needs no protobuf, unlike
transformWithState — rocksdbjni ships with pyspark). Asserts the same
watermark-eviction plateau and records RocksDB-specific memory/SST
metrics the HDFS-backed run can't surface.

Results land in state_rocksdb_r11.json and the SCALE.md r11 ledger.
"""
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

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def main():
    spark = get_spark(
        app_name="r11-rocksdb-state",
        extra_conf={
            "spark.sql.streaming.stateStore.providerClass": ROCKSDB,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == ROCKSDB
    )
    events = load_table(
        spark, os.path.join(REPO, "benchdata", "sf1"), "events"
    ).select(
        "ts",
        F.concat("event_type", F.lit("_"), "user_id").alias("k"),
    )
    tmp = tempfile.mkdtemp(prefix="state_rocksdb_")
    try:
        src = os.path.join(tmp, "src")
        # sequential slice writes: file stream orders by mtime, and an
        # out-of-order slice would advance the watermark early
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
        ops = [
            op
            for p in progress
            for op in p.get("stateOperators", [])
        ]
        series = [op["numRowsTotal"] for op in ops]
        removed = sum(op.get("numRowsRemoved", 0) for op in ops)
        mem = [
            op.get("customMetrics", {}).get("rocksdbTotalMemoryUsageBytes")
            for op in ops
        ]
        sst = [
            op.get("customMetrics", {}).get("rocksdbSstFileSize")
            for op in ops
        ]
        v = _latest_version(os.path.join(tmp, "state"))
        total_groups = spark.read.parquet(
            os.path.join(tmp, "state", f"v{v}")
        ).count()
        out = {
            "provider": "RocksDBStateStoreProvider",
            "total_groups": total_groups,
            "state_rows_per_trigger": series,
            "rows_removed_total": removed,
            "plateau_max_mid": max(series[2:-1]) if len(series) > 3 else None,
            "rocksdb_mem_bytes_max": max((m for m in mem if m), default=None),
            "rocksdb_sst_bytes_max": max((s for s in sst if s), default=None),
        }
        print("RESULT " + json.dumps(out), flush=True)
        with open(os.path.join(REPO, "state_rocksdb_r11.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
