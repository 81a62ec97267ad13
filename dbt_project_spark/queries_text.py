"""Text-analysis family over `documents`: token stats, quality
scoring, language ID, fingerprinting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_project_spark.catalog import register
from dbt_project_spark.operators.text import (
    STOPWORDS,
    fingerprints,
    language_id,
    quality_features,
    with_token_stats,
)
from dbt_project_spark.sources import load_table

_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _in_list(langs) -> str:
    return ", ".join(f"'{w}'" for lang in langs for w in STOPWORDS[lang])


@register(
    "text_tokens",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks,
                      length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS n_alnum
               FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
           CAST(n_alnum AS BIGINT) AS n_alnum_chars
    FROM t
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counting (regex tokenizer, codegen arrays)."""
    return with_token_stats(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "n_unique_tokens", "n_alnum_chars"
    )


@register(
    "text_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks,
                      CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS n_alnum
               FROM documents),
    s AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
                 CAST(len(list_filter(toks, x -> x IN ({_in_list(STOPWORDS)}))) AS BIGINT) AS n_stop,
                 n_alnum
          FROM t)
    SELECT doc_id,
           n_alnum / n_tokens AS avg_token_len,
           n_stop / n_tokens AS stopword_ratio,
           n_unique / n_tokens AS unique_ratio,
           (n_tokens >= 20 AND n_stop / n_tokens < 0.5 AND n_unique / n_tokens > 0.2)
               AS is_quality
    FROM s
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality filter features + keep-flag."""
    return quality_features(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "avg_token_len", "stopword_ratio", "unique_ratio", "is_quality"
    )


@register(
    "text_langid",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    h AS (SELECT doc_id, lang,
                 CAST(len(list_filter(toks, x -> x IN ({_in_list(['en'])}))) AS BIGINT) AS en_hits,
                 CAST(len(list_filter(toks, x -> x IN ({_in_list(['es'])}))) AS BIGINT) AS es_hits,
                 CAST(len(list_filter(toks, x -> x IN ({_in_list(['de'])}))) AS BIGINT) AS de_hits
          FROM t)
    SELECT doc_id, lang, en_hits, es_hits, de_hits,
           CASE WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
                WHEN es_hits >= de_hits THEN 'es'
                ELSE 'de' END AS predicted_lang
    FROM h
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID next to the labeled lang column."""
    return language_id(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "en_hits", "es_hits", "de_hits", "predicted_lang"
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    s AS (SELECT doc_id, toks,
                 CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform(
                      range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                      ELSE [] END AS sh
          FROM t)
    SELECT doc_id,
           substr(md5(array_to_string(list_sort(list_distinct(toks)), ' ')), 1, 16)
               AS bag_fingerprint,
           list_min(list_transform(sh, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT))
               AS min_shingle_hash
    FROM s
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag fingerprint (md5 of sorted unique tokens) + min-shingle
    rolling-hash fingerprint."""
    return fingerprints(load_table(spark, sf_dir, "documents"), "doc_id")
