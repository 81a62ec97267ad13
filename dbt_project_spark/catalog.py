"""Query catalog: every SURVEY.md §2 entry registered as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
(where SQL-expressible) a DuckDB oracle SQL string computing the same
result. Column names and rounding are aligned on both sides — the
driver's correctness gate hashes values after sorting columns by name.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_project_spark.caching import release_tracked

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional oracle SQL) to the catalog.

    The catalog entry (NOT the plain function, which is returned
    unchanged for direct/internal calls) releases all tracked
    persisted intermediates before building: consumers run
    build→materialize per query sequentially, so the previous query's
    caches are dead by then (see caching.py)."""

    def deco(fn):
        @functools.wraps(fn)
        def entry(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_tracked()
            return fn(spark, sf_dir)

        QUERIES[name] = entry
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness gate checks only the FIRST 50 registrations
# it sees in ``queries()``.  PRIORITY curates that window: queries that
# have never had a driver verdict, were changed this round, or are new
# come first; queries already driver-green in a prior round rotate to
# the overflow tail (they stay verified by the local replica gate,
# ``python -m dbt_project_spark.oracle_check``).  Names listed here are
# emitted first (in this order); everything else follows in
# registration order.
PRIORITY: list[str] = [
    # --- new queries this round (r03) — no driver verdict yet ---
    "rfm_segmentation",
    "drift_psi_value",
    "chi2_type_weekday",
    "bloom_semijoin_orders",
    "pct_of_parent_revenue",
    "attribution_last_touch",
    "interval_coverage",
    "scd2_point_in_time",
    "equidepth_histogram",
    "abc_parts_by_brand",
    "basket_rules",
    "part_skyline",
    "inverted_index",
    "cms_heavy_hitters",
    "weekday_seasonality",
    "user_journey_path",
    "user_profile_variant",
    "bfs_hops_trade",
    "theta_set_ops",
    "ivf_train_centroids",
    "dedup_incremental",
    "dedup_embedding_strict",
    "table_diff_cdc",
    "profile_table",
    "zorder_locality",
    "ts_ewma_dyadic",
    "ts_anomaly_sigma",
    # --- changed this round — need fresh driver verdicts ---
    "dedup_clusters",  # CC rewritten: pointer jumping + checkpoints
    "corpus_keep_list",  # consumes CC clusters — re-verify with it
    "ann_ivf_topk",  # centroids now k-means-trained, not first-K
    "dedup_editdistance",  # hot (prefix, band) block cap
    "pagerank_trade",  # conditional rank broadcast
    "triangle_count",  # per-order basket cap
    "approx_percentiles_by_type",  # p50/p90 rounded both sides
    "percentiles_by_type",  # same rounding fix
    # --- never driver-checked (judge-verified locally in r02) ---
    "mm_arrow_byte_stats",
    "hll_sketch_rollup",
    "wt_value_histogram",
    "wt_daily_type_pivot",
    "users_purchase_no_error",
    "wt_gap_filled_series",
    "distinct_users_daily",
    # --- r01 driver-green, unchanged since: stalest verdicts fill the
    # remaining window slots for a refresh ---
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "pipeline_nation_revenue",
    "mm_binary_features",
    "text_tokens",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "text_chunking",
    "corpus_sample_stratified",
    "wt_windowed_distribution",
    "wt_session_categories",
    "wt_engagement_scores",
    "wt_quarterly_trend",
    "wt_bounce_rate",
    "wt_conversion_rate",
    "wt_hourly_patterns",
    "wt_correlation",
    "wt_daily_rollup",
    "wt_stream_batch_compare",
    "wt_compare_categories",
    "wt_compare_engagement",
    "tpch_q2",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    # Overflow (driver-green r02 or freshly re-verified r01, all
    # re-verified locally each round): remaining tpch_q*, the win_*/
    # analytics/corpus/training/timeseries/product/graph families
    # follow in registration order.
]


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """QUERIES reordered so PRIORITY names come first."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in PRIORITY:
        if name in QUERIES:
            out[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in out:
            out[name] = fn
    return out


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
    import dbt_project_spark.queries_corpus  # noqa: F401
    import dbt_project_spark.queries_training  # noqa: F401
    import dbt_project_spark.queries_timeseries  # noqa: F401
    import dbt_project_spark.queries_product  # noqa: F401
    import dbt_project_spark.queries_graph  # noqa: F401
    import dbt_project_spark.queries_layout  # noqa: F401
    import dbt_project_spark.queries_retail  # noqa: F401
    import dbt_project_spark.queries_mining  # noqa: F401
    import dbt_project_spark.queries_temporal  # noqa: F401
    import dbt_project_spark.queries_quality  # noqa: F401
