"""Tumbling-window aggregation operators.

Scale notes (verified via ``.explain("formatted")``): a tumbling-
window groupBy is one exchange on (window_start, *keys) with map-side
partial aggregation, so shuffled bytes scale with the number of
distinct (window, key) groups, not input rows. The pct-of-window
window-function adds a second exchange on window_start — deliberately
kept: it moves only the already-aggregated groups (tiny), whereas the
single-exchange alternative (repartition raw rows by window_start
first) would shuffle the full input and forfeit map-side combine.
At 100 TB the two-exchange plan shuffles ~|groups| rows; the
one-exchange plan shuffles ~|events|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbt_project_spark.functions.expressions import window_bounds


def with_tumbling_window(df: DataFrame, ts_col: str, width_sec: int) -> DataFrame:
    """Add window_start / window_end string columns (epoch-floor)."""
    start, end = window_bounds(ts_col, width_sec)
    return df.withColumn("window_start", start).withColumn("window_end", end)


def windowed_count_distribution(
    df: DataFrame,
    ts_col: str,
    width_sec: int,
    key_cols: Sequence[str],
    pct_decimals: int = 2,
) -> DataFrame:
    """Per-window key distribution with percentage-of-window.

    Reference parity: batch_stream.sql:6-21 (page_views_distribution) /
    spark_streaming_new.py:142-153.
    """
    keys = list(key_cols)
    counted = (
        with_tumbling_window(df, ts_col, width_sec)
        .groupBy("window_start", "window_end", *keys)
        .agg(F.count(F.lit(1)).alias("count"))
    )
    w = Window.partitionBy("window_start")
    return counted.withColumn(
        "percentage",
        F.round(F.lit(100.0) * F.col("count") / F.sum("count").over(w), pct_decimals),
    )


def windowed_stats(
    df: DataFrame,
    ts_col: str,
    width_sec: int,
    aggs: Sequence[Column],
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Generic tumbling-window aggregate (avg/min/max/sum/...)."""
    return (
        with_tumbling_window(df, ts_col, width_sec)
        .groupBy("window_start", "window_end", *key_cols)
        .agg(*aggs)
    )


def two_level_rollup(
    df: DataFrame,
    ts_col: str,
    fine_sec: int,
    coarse_sec: int,
    value_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Roll a fine pre-aggregation up into a coarse window.

    The scale pattern behind streaming/batch parity: sums and counts
    reassociate exactly, so a 1-min partial aggregate (cheap,
    incremental) rolls up to the 5-min answer bit-for-bit. Avg at the
    coarse level is recomputed as sum/count, never avg-of-avgs.
    """
    if coarse_sec % fine_sec != 0:
        raise ValueError("coarse window must be a multiple of the fine window")
    keys = list(key_cols)
    fine = (
        with_tumbling_window(df, ts_col, fine_sec)
        .groupBy("window_start", "window_end", *keys)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(value_col).alias("val_sum"),
        )
        .withColumnRenamed("window_start", "fine_start")
        .drop("window_end")
    )
    start, end = window_bounds(F.to_timestamp("fine_start"), coarse_sec)
    return (
        fine.withColumn("window_start", start)
        .withColumn("window_end", end)
        .groupBy("window_start", "window_end", *keys)
        .agg(
            F.sum("cnt").alias("n_events"),
            F.sum("val_sum").alias("value_sum"),
        )
    )
