"""Scalar conditional-rate aggregates (bounce rate, conversion rate).

Reference parity: batch_stream.sql:95-113. A single full-scan aggregate:
map-side partial (conditional sum + count), one-row exchange — the
cheapest possible shape at any scale; the scan is the cost and it
prunes to exactly the predicate columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_rate(
    df: DataFrame,
    predicate: Column,
    out_col: str,
    decimals: int = 2,
) -> DataFrame:
    """100 * rows-matching-predicate / rows, rounded."""
    return df.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(predicate, 1).otherwise(0))
            / F.count(F.lit(1)),
            decimals,
        ).alias(out_col)
    )
