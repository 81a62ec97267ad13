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
    # --- r05 window curation (VERDICT r04 task 1): the 37 queries
    # with NO driver verdict yet (union of CORRECTNESS_r01..r04)
    # come first, so the 50-slot r05 window finally hard-gates them.
    # All 37 are green in the local replica gate at sf0.01.
    "priority_sample_weighted",
    "minhash_estimate_error",
    "text_readability",
    "ann_recall_quantized",
    "ann_recall_truncated_dims",
    "fd_profile",
    "rapid_repeat_orders",
    "mm_chunk_dedup",
    "cumulative_reach_daily",
    "pq_train_encode",
    "pq_ann_topk",
    "dedup_cluster_histogram",
    "collocation_pmi",
    "zipf_vocab_fit",
    "heaps_law_fit",
    "error_burst_detect",
    "interarrival_stats",
    "mk_trend_sen_slope",
    "ks_exponential_interarrival",
    "dft_weekly_power",
    "cohort_revenue_retention",
    "cuped_variance_reduction",
    "lift_chart_deciles",
    "user_item_recs",
    "clustering_coefficient",
    "lpa_communities",
    "link_prediction_jaccard",
    "repurchase_intervals",
    "price_elasticity_parts",
    "segment_migration_matrix",
    "revenue_bridge_pvm",
    "activity_bitmask_stats",
    "watermark_lateness_stats",
    "spc_pchart_error_rate",
    "profile_drift_halves",
    "kaplan_meier_retention",
    "table_file_stats",
    # --- new in r05 (no driver verdict yet), complexity-first: the 13
    # here fill window slots 38..50; dp_noisy_daily_counts (simplest,
    # locally + vanilla green) and the changed-refresh block below
    # overflow to the r06 window. ---
    "ivf_build_index",
    "ann_ivfpq_topk",
    "ann_ivfpq_residual_topk",
    "mm_chunk_dedup_cdc",
    "attribution_markov_removal",
    "minhash_band_tuning",
    "ann_recall_ivfpq",
    "ann_recall_ivfpq_residual",
    "ann_recall_ivf",
    "corpus_gopher_rules",
    "welch_ttest_value",
    "slo_burn_rate",
    "price_index_laspeyres",
    "dp_noisy_daily_counts",
    "vocab_coverage_curve",
    "hits_trade",
    "ivf_cell_balance",
    "ann_probe_recall_sweep",
    "bpe_train_merges",
    "bpe_tokenize_stats",
    "dedup_semantic",
    "dedup_semantic_recall",
    "dsir_importance_weights",
    "nb_lang_classifier",
    "ccnet_perplexity_buckets",
    "moore_lewis_selection",
    "embedding_dim_drift",
    "dedup_semantic_keeplist",
    "exact_substr_spans",
    "degree_assortativity",
    "bpe_fertility_by_lang",
    "ts_double_exp_smoothing",
    "ann_ivfpq_refine",
    "ann_recall_ivfpq_refine",
    "bm25_ndcg_eval",
    "ab_srm_check",
    "mm_byte_entropy",
    "semantic_threshold_sweep",
    "corpus_selection_composite",
    "trade_reciprocity",
    "bpe_pack_budget",
    "bootstrap_mean_ci",
    "negative_sampling_dist",
    "attribution_time_decay",
    "user_activity_streaks",
    "corpus_novelty_curve",
    "nb_margin_calibration",
    "ranker_agreement_topk",
    "winnowing_fingerprints",
    "ranker_kendall_tau",
    "source_temperature_mix",
    "did_estimator",
    "pack_padding_waste_sweep",
    "simpson_slope_reversal",
    "ab_power_mde",
    "anova_oneway",
    "jarque_bera_value",
    "spearman_user_value",
    "l_diversity_audit",
    "xcorr_lead_lag",
    "embedding_pca_power",
    "quantile_drift_qq",
    "order_backlog_series",
    "pca_explained_variance",
    "query_expansion_prf",
    "pii_density_report",
    "stratified_kfold_assignment",
    "degree_powerlaw_fit",
    "lorenz_curve_deciles",
    "weibull_survival_fit",
    "count_overdispersion",
    "hash_uniformity_audit",
    "embedding_pca_outliers",
    "dft_power_spectrum",
    "vocab_drift_halves",
    "ngram_entropy_rate",
    "filter_agreement_kappa",
    "fulfillment_latency_by_priority",
    "markov_stationary_mix",
    "ab_sequential_wald",
    "source_lm_surprisal",
    "linreg_two_factor",
    "holdout_perplexity_bigram",
    "knn_langid_eval",
    "dedup_cross_batch",
    "simhash_radius_sweep",
    "gumbel_block_maxima",
    "conversion_window_sensitivity",
    "bm25_param_sensitivity",
    "embedding_centroid_separation",
    "shard_interleave_runs_test",
    "weekend_conversion_odds",
    "dedup_pair_transitivity",
    "ingest_gap_report",
    "negbin_moment_fit",
    "capture_recapture_users",
    "good_turing_unseen_mass",
    "source_distinctive_terms",
    "forecast_backtest_coverage",
    "ratio_metric_delta_method",
    "minhash_vs_exact_recall",
    "nb_mcc_score",
    "ts_variance_ratio",
    "dedup_survivorship_by_source",
    "recency_churn_auc",
    "markov_reach_purchase",
    "hill_tail_index",
    # --- changed in r04/r05 (previously driver-green, re-verified
    # locally after the change, plus the vanilla-session gate) —
    # verdict refreshes; these rotate into the r06 window ---
    "ann_ivf_topk",
    "ivf_train_centroids",
    "triangle_count",
    "dedup_clusters",
    "corpus_keep_list",
    "bfs_hops_trade",
    "twa_by_type_day",
    "win_time_range_avg",
    "bigram_lm_quality",
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
    import dbt_project_spark.queries_retrieval  # noqa: F401
    import dbt_project_spark.queries_governance  # noqa: F401
    import dbt_project_spark.queries_ops  # noqa: F401
