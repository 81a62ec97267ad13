"""Profiling aggregates: hour-of-day patterns, correlation matrix.

Reference parity: spark_streaming_new.py:227-252 (hourly_patterns,
correlation_analysis). ``corr`` is Spark's built-in distributed Pearson
co-moment aggregate — single pass, map-side partials.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_profile(
    df: DataFrame,
    ts_col: str,
    metric_cols: Sequence[str] = (),
    decimals: int = 6,
    avg_exprs: dict[str, "F.Column"] | None = None,
) -> DataFrame:
    """Hour-of-day profile. ``avg_exprs`` lets callers supply exact
    fixed-point average expressions instead of float ``avg`` (needed
    for bit-identical oracle parity)."""
    aggs = [F.count(F.lit(1)).alias("visit_count")] + [
        F.round(F.avg(m), decimals).alias(f"avg_{m}") for m in metric_cols
    ] + [expr.alias(name) for name, expr in (avg_exprs or {}).items()]
    return (
        df.groupBy(F.hour(ts_col).cast("int").alias("hour_of_day"))
        .agg(*aggs)
        .orderBy("hour_of_day")
    )


def correlation_matrix(
    df: DataFrame,
    cols: Sequence[str],
    decimals: int = 6,
) -> DataFrame:
    """All pairwise Pearson correlations, one row, one pass."""
    exprs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            exprs.append(F.round(F.corr(a, b), decimals).alias(f"corr_{a}_{b}"))
    return df.agg(*exprs)
