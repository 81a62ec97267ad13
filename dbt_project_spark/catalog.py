"""Query catalog: every SURVEY.md §2 entry registered as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
(where SQL-expressible) a DuckDB oracle SQL string computing the same
result. Column names and rounding are aligned on both sides — the
driver's correctness gate hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional oracle SQL) to the catalog."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query family so registration side-effects run."""
    import dbt_project_spark.queries_web  # noqa: F401
    import dbt_project_spark.queries_tpch  # noqa: F401
    import dbt_project_spark.queries_dedup  # noqa: F401
    import dbt_project_spark.queries_text  # noqa: F401
    import dbt_project_spark.queries_similarity  # noqa: F401
    import dbt_project_spark.queries_pipeline  # noqa: F401
    import dbt_project_spark.queries_multimodal  # noqa: F401
    import dbt_project_spark.queries_analytics  # noqa: F401
    import dbt_project_spark.queries_vectors  # noqa: F401
