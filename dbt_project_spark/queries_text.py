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


@register(
    "text_chunking",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    c AS (SELECT doc_id,
                 unnest(range(0, CAST(ceil(len(toks) / 64.0) AS BIGINT))) AS chunk_idx,
                 unnest(list_transform(range(0, CAST(ceil(len(toks) / 64.0) AS BIGINT)),
                        i -> array_to_string(toks[i*64 + 1 : i*64 + 96], ' '))) AS chunk
          FROM t WHERE len(toks) > 0)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk,
           CAST(len(regexp_extract_all(chunk, '[a-z0-9]+')) AS BIGINT) AS chunk_tokens
    FROM c
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (chunk=96 tokens, stride=64)
    — the standard long-document splitter for a training pipeline.
    Pure codegen arrays: chunk list built per row, then posexplode;
    no shuffle at all until a downstream aggregation.

    DuckDB slicing is 1-based inclusive `l[a:b]`; the Spark side uses
    `slice(toks, i*64+1, 96)` — same 96-token windows every 64.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.withColumn("toks", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
    c = (
        t.filter(F.size("toks") > 0)
        .withColumn(
            "chunks",
            F.expr(
                "transform(sequence(0, CAST(ceil(size(toks) / 64.0) AS INT) - 1),"
                " i -> array_join(slice(toks, i*64 + 1, 96), ' '))"
            ),
        )
        .select("doc_id", F.posexplode("chunks").alias("chunk_idx", "chunk"))
    )
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "chunk",
        F.expr("size(regexp_extract_all(chunk, '[a-z0-9]+', 0))")
        .cast("bigint")
        .alias("chunk_tokens"),
    )


@register(
    "corpus_sample_stratified",
    oracle="""
    WITH h AS (SELECT doc_id, lang, source,
                      ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket
               FROM documents),
    kept AS (SELECT * FROM h WHERE
               (lang = 'en' AND bucket < 50) OR (lang <> 'en' AND bucket < 80))
    SELECT lang, COUNT(*) AS n_kept,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM kept GROUP BY lang
    """,
)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by content-hash bucket: 50%
    of English, 80% of everything else (the rebalancing move for a
    multilingual corpus). Hash-bucket sampling is reproducible across
    engines and runs — no RNG, no seed management, stable under
    re-partitioning — which is why it's the standard for train/val
    splits at scale."""
    from dbt_project_spark.functions.expressions import md5_int

    docs = load_table(spark, sf_dir, "documents")
    h = docs.withColumn("bucket", md5_int("text") % 100)
    kept = h.filter(
        ((F.col("lang") == "en") & (F.col("bucket") < 50))
        | ((F.col("lang") != "en") & (F.col("bucket") < 80))
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
    )


# ---------------------------------------------------------------------------
# text_readability — Flesch reading-ease scoring (r4s4)
# ---------------------------------------------------------------------------


@register(
    "text_readability",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      CAST(len({_TOKS}) AS BIGINT) AS w,
                      CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')),
                                    1) AS BIGINT) AS s,
                      CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                           AS BIGINT) AS syl
               FROM documents)
    SELECT doc_id, w AS n_words, s AS n_sentences, syl AS n_syllables,
           CAST(206835000 - (1015000 * w // s) - (84600000 * syl // w)
                AS BIGINT) AS flesch_micro
    FROM t WHERE w > 0
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease score per document: 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/word), with sentences
    counted as [.!?]+ runs (floor 1) and syllables approximated by
    vowel-group runs — the standard cheap proxy (real syllabifiers
    need dictionaries; quality filters ship exactly this
    approximation). Low scores flag academic/legalese sludge; scores
    near 100 read like primary-school text — a corpus-curation signal
    next to text_quality's length/stopword features.

    Exactness: all three counts are integers from one regexp pass
    each; the score is two truncating integer divisions in micro
    units (each term ×1e6), identical in both engines — no float
    anywhere.

    Scale shape: a pure per-row projection (regexp_extract_all runs
    inside codegen); no shuffle at all — the scan is the plan.
    """
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
            " AS BIGINT)"
        ).alias("w"),
        F.expr(
            "CAST(GREATEST(size(regexp_extract_all(text, '[.!?]+', 0)), 1)"
            " AS BIGINT)"
        ).alias("s"),
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
            " AS BIGINT)"
        ).alias("syl"),
    )
    return t.where(F.col("w") > 0).select(
        "doc_id",
        F.col("w").alias("n_words"),
        F.col("s").alias("n_sentences"),
        F.col("syl").alias("n_syllables"),
        F.expr(
            "CAST(206835000 - (1015000 * w div s) - (84600000 * syl div w)"
            " AS BIGINT)"
        ).alias("flesch_micro"),
    )
