"""Result-comparison operators: mismatch detection + accuracy scoring.

Reference parity: comparision.sql — the reference joins its streaming
output tables against batch-derived tables, keeps mismatching rows, and
scores accuracy with a COALESCE/ABS tolerance. Here the same operator
compares any two DataFrames on shared keys.

Scale notes: an equi-join on the comparison keys (both sides already
aggregated, so small relative to the facts); if one side is a dimension
-sized summary Spark's AQE will pick a broadcast join at runtime.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_frames(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    suffixes: tuple[str, str] = ("_stream", "_batch"),
) -> DataFrame:
    """Full outer join on keys; per-column left/right values + match flag."""
    ls, rs = suffixes
    l = left.select(*keys, *[F.col(c).alias(f"{c}{ls}") for c in value_cols])
    r = right.select(*keys, *[F.col(c).alias(f"{c}{rs}") for c in value_cols])
    joined = l.join(r, on=list(keys), how="full_outer")
    # null-safe equality via coalesce-to-NaN: Spark SQL defines
    # NaN = NaN as TRUE, so two missing sides compare as a match while
    # missing-vs-present compares false (value = NaN is false).
    match = F.lit(True)
    for c in value_cols:
        match = match & (
            F.coalesce(F.col(f"{c}{ls}"), F.lit(float("nan")))
            == F.coalesce(F.col(f"{c}{rs}"), F.lit(float("nan")))
        )
    return joined.withColumn("is_match", match)


def accuracy_summary(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    value_col: str,
    tolerance: float = 10.0,
    label: str = "comparison",
    suffixes: tuple[str, str] = ("_stream", "_batch"),
) -> DataFrame:
    """Reference accuracy_comparison (comparision.sql:65-79): share of
    rows whose |left - right| <= tolerance, COALESCE(x, 0) semantics."""
    ls, rs = suffixes
    cmp = compare_frames(left, right, keys, [value_col], suffixes)
    within = (
        F.abs(
            F.coalesce(F.col(f"{value_col}{ls}"), F.lit(0.0))
            - F.coalesce(F.col(f"{value_col}{rs}"), F.lit(0.0))
        )
        <= tolerance
    )
    return cmp.agg(
        F.lit(label).alias("table_name"),
        F.count(F.lit(1)).alias("total_records"),
        F.sum(F.when(within, 1).otherwise(0)).alias("matching_records"),
        F.round(
            F.lit(100.0) * F.sum(F.when(within, 1).otherwise(0)) / F.count(F.lit(1)),
            2,
        ).alias("accuracy_percentage"),
    )
