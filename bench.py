#!/usr/bin/env python
"""Benchmark headline queries; prints ONE JSON line.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is forced end-to-end with the
noop sink (full computation, no collect/driver materialization cost).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_project_spark import get_spark
from dbt_project_spark.catalog import QUERIES, load_all

HEADLINE = [
    "wt_windowed_distribution",
    "wt_engagement_scores",
    "wt_stream_batch_compare",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q18",
    "pipeline_nation_revenue",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_quality",
    "ann_bruteforce_topk",
    "mm_binary_features",
    "sessionization",
    "win_running_total",
    "percentiles_by_type",
    "tpch_q21",
    # round 2: re-blocked / new operators
    "dedup_embedding",
    "ann_ivf_topk",
    "approx_distinct_users_daily",
    "skew_salted_join",
    "contamination_ngram",
    "dedup_clusters",
    "mm_audio_windows",
    # round 2, session 2: graph / product / training additions
    "triangle_count",
    "pagerank_trade",
    "scd2_user_tier",
    "seq_pack",
    "corpus_mix_sample",
    "grouping_sets_matrix",
    "resample_interpolate",
    "mm_arrow_byte_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    load_all()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen once so per-query times measure the plan,
    # not first-run JIT: one scan+agg shape and one window shape
    # (window codegen is a separate JIT surface — measured: without
    # this, the first windowed headline query reads ~2x its steady
    # state).
    QUERIES["tpch_q6"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    QUERIES["win_lag_delta"](spark, sf_dir).write.mode("overwrite").format("noop").save()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
