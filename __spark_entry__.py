"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dbt_project_spark/`` — see SURVEY.md §2 for
the inventory; each entry here is registered by a query-family module.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_project_spark.catalog import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all,
    ordered_queries,
)

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the engagement-score
    windowed pipeline (the reference's core streaming analytic, batch
    form)."""
    return QUERIES["wt_engagement_scores"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered by ``catalog.priority_names()`` (derived at call time
    from the checked-in CORRECTNESS_r*.json) so the driver's 50-query
    correctness window always covers never-verified / changed / new
    queries first; prior-round driver-green queries overflow the
    window but stay covered by the local replica gate.
    """
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column names).

    Queries absent here (present in ``queries()`` only) are genuinely
    non-SQL-expressible ops — the driver records a rows-only check.
    """
    return dict(ORACLES)
