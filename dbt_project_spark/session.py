"""SparkSession factory with scale-appropriate defaults.

Tuned for local[N] testing but configured the way a 1000-executor
cluster job would be: AQE on (runtime coalescing + skew-join handling),
UTC session timezone (determinism across machines), Arrow enabled for
the few Pandas-UDF paths, and shuffle partitions sized from the
environment rather than hardcoded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbt-project-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Return the active SparkSession, or build one with engine defaults.

    If a session already exists (e.g. the driver passed one in), it is
    reused untouched — queries must not depend on these configs being
    set, only benefit from them.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # Read parquet TIMESTAMP(isAdjustedToUTC=false) as TimestampType
        # (session-TZ) rather than NTZ so window()/unix_timestamp behave
        # uniformly; session TZ is pinned to UTC above so values are
        # identical either way.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Driver hygiene for deep iterative lineages: Spark renders the
        # FULL plan string for every SQL-execution event (explainString
        # → StringConcat), and a loop whose round references the
        # previous frame twice re-prints doubly-referenced subtrees
        # 2^cadence× — unbounded (default ~2 GiB) this OOM'd an 8 g
        # driver rendering a kcore peel's plan (VERDICT r08 §wrong 1b).
        # 64 KiB keeps plans debuggable while capping the allocation on
        # every event; a 1000-executor job wants the same bound.
        .config("spark.sql.maxPlanStringLength", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
