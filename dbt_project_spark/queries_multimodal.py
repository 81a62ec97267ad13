"""Multimodal family: binary-column feature extraction via
``mapInPandas`` (Arrow-batched Python — the one deliberate non-JVM
path in the engine, since codec work is inherently Python/native)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbt_project_spark.catalog import register
from dbt_project_spark.operators.multimodal import attach_blob, extract_features
from dbt_project_spark.sources import load_table


@register(
    "mm_binary_features",
    oracle="""
    WITH b AS (SELECT doc_id, text, encode(text) AS content FROM documents),
    -- md5 of the UTF-8 payload == md5 of the text (DuckDB's md5 takes
    -- VARCHAR; the payload IS the UTF-8 encoding of that VARCHAR)
    h AS (SELECT doc_id,
                 CAST(octet_length(content) AS BIGINT) AS n_bytes,
                 md5(text) AS content_md5,
                 ('0x' || substr(md5(text), 1, 8))::BIGINT AS hint
          FROM b)
    SELECT doc_id, n_bytes, content_md5,
           CAST(64 + (hint % 1857) AS INT) AS fake_width,
           CAST(64 + ((hint >> 11) % 1017) AS INT) AS fake_height
    FROM h
    """,
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → Arrow-batched feature extraction (decode step
    deterministic-fake; see operators/multimodal.py)."""
    docs = attach_blob(load_table(spark, sf_dir, "documents"))
    return extract_features(docs)
