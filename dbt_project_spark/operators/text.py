"""Text-analysis operators: token stats, quality scoring, language ID,
fingerprinting. All codegen'd array/string expressions (no UDFs) —
at 100 TB the hot path stays inside whole-stage codegen and the only
shuffle is whatever aggregation the caller adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_project_spark.functions.expressions import md5_int
from dbt_project_spark.operators.dedup import shingles_col, tokens_col

# Tiny stopword profiles for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit"),
}


def _hits(lang: str) -> F.Column:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(f"size(filter(__toks, x -> x IN ({lst})))").cast("bigint")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add __toks, n_tokens, n_unique_tokens, n_alnum_chars."""
    return (
        df.withColumn("__toks", tokens_col(text_col))
        .withColumn("n_tokens", F.size("__toks").cast("bigint"))
        .withColumn(
            "n_unique_tokens", F.size(F.array_distinct("__toks")).cast("bigint")
        )
        .withColumn(
            "n_alnum_chars",
            F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")).cast(
                "bigint"
            ),
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / avg-token-length / stopword-ratio quality features plus
    a boolean keep-flag — the standard pre-training corpus filter
    shape. All ratios are single divisions of exact integers."""
    stop_all = tuple(w for ws in STOPWORDS.values() for w in ws)
    lst = ", ".join(f"'{w}'" for w in stop_all)
    d = with_token_stats(df, text_col).withColumn(
        "n_stopwords", F.expr(f"size(filter(__toks, x -> x IN ({lst})))").cast("bigint")
    )
    return (
        d.withColumn("avg_token_len", F.col("n_alnum_chars") / F.col("n_tokens"))
        .withColumn("stopword_ratio", F.col("n_stopwords") / F.col("n_tokens"))
        .withColumn("unique_ratio", F.col("n_unique_tokens") / F.col("n_tokens"))
        .withColumn(
            "is_quality",
            (F.col("n_tokens") >= 20)
            & (F.col("stopword_ratio") < 0.5)
            & (F.col("unique_ratio") > 0.2),
        )
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language scoring with deterministic argmax
    (tie order: en > es > de)."""
    d = df.withColumn("__toks", tokens_col(text_col))
    for lang in STOPWORDS:
        d = d.withColumn(f"{lang}_hits", _hits(lang))
    return d.withColumn(
        "predicted_lang",
        F.when(
            (F.col("en_hits") >= F.col("es_hits"))
            & (F.col("en_hits") >= F.col("de_hits")),
            "en",
        )
        .when(F.col("es_hits") >= F.col("de_hits"), "es")
        .otherwise("de"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Content fingerprints: order-insensitive bag fingerprint (md5 of
    sorted unique tokens) + min-shingle rolling-hash fingerprint."""
    d = df.withColumn("__toks", tokens_col(text_col)).withColumn(
        "__sh", shingles_col("__toks", 3)
    )
    return d.select(
        F.col(id_col),
        F.substring(
            F.md5(F.array_join(F.array_sort(F.array_distinct("__toks")), " ")), 1, 16
        ).alias("bag_fingerprint"),
        F.array_min(F.transform("__sh", lambda s: md5_int(s))).alias(
            "min_shingle_hash"
        ),
    )
