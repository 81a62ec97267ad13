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


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-pass table profiling: per column emit row count, null
    count, exact distinct count, and min/max (as strings).

    All aggregates run in a SINGLE aggregation — one scan, one
    shuffle; multi-column COUNT(DISTINCT) plans through Catalyst's
    Expand (rows × n_cols map-side, partial-agg combined), which is
    the exact-profile trade. At 100 TB swap ``F.countDistinct`` for
    ``F.approx_count_distinct`` to drop the Expand multiplier — the
    query shape is otherwise unchanged. min/max are cast to string by
    the caller's column derivations (bigint/string/formatted-date
    only) so the output is engine-exact.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'",
            f"__n - __nn_{c}",
            f"__nd_{c}",
            f"__mn_{c}",
            f"__mx_{c}",
        ]
    stacked = row.selectExpr(
        "__n",
        f"stack({len(cols)}, {', '.join(stack_args)})"
        " AS (col_name, n_null, n_distinct, min_value, max_value)",
    )
    return stacked.select(
        "col_name",
        F.col("__n").alias("n_rows"),
        "n_null",
        "n_distinct",
        "min_value",
        "max_value",
    )
