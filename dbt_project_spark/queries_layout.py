"""Physical-layout family: Z-order clustering validation.

The Z-curve itself is engine-agnostic integer bit math, so the oracle
verifies the exact Morton codes; the file-level pruning payoff (tight
per-file bounding boxes in every clustered dimension) is asserted in
tests/test_layout.py against real parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_project_spark.catalog import register
from dbt_project_spark.operators.layout import (
    ZORDER_BITS,
    zorder_key,
    zorder_key_sql,
)
from dbt_project_spark.sources import load_table

# bucket = top 8 bits of the 32-bit Z-value: 256 spatial cells, each a
# contiguous Z-range = an axis-aligned box in (user, value) space.
_BUCKET_SHIFT = 2 * ZORDER_BITS - 8


@register(
    "zorder_locality",
    oracle=f"""
    WITH src AS (
      SELECT (user_id & 65535) AS u,
             (CAST(round(value * 100, 0) AS BIGINT) & 65535) AS v
      FROM events),
    z AS (SELECT u, v, ({zorder_key_sql(["u", "v"])}) AS zval FROM src)
    SELECT zval >> {_BUCKET_SHIFT} AS z_bucket,
           COUNT(*) AS n_rows,
           MIN(u) AS u_min, MAX(u) AS u_max,
           MIN(v) AS v_min, MAX(v) AS v_max
    FROM z GROUP BY z_bucket
    """,
)
def zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering of events on (user_id, value):
    per z-bucket row counts and per-dimension bounding boxes.

    The boxes are the point: each bucket (a contiguous Z-range, i.e. a
    candidate output file of ``zorder_write``) spans at most 1/16 of
    EACH dimension's range, which is what makes parquet min/max stats
    prune 2-D box predicates. The Morton code is a flat OR of 32
    shift/AND terms inside whole-stage codegen; one shuffle for the
    groupBy. Oracle computes the identical interleave in SQL."""
    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        F.col("user_id").bitwiseAND(F.lit(65535)).alias("u"),
        F.round(F.col("value") * 100, 0)
        .cast("bigint")
        .bitwiseAND(F.lit(65535))
        .alias("v"),
    )
    z = src.withColumn("zval", zorder_key(["u", "v"]))
    return z.groupBy(
        F.shiftright("zval", _BUCKET_SHIFT).alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("u").alias("u_min"),
        F.max("u").alias("u_max"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )
