"""CASE-style bucketing of a numeric column into labeled categories.

Reference parity: batch_stream.sql:42-46 / spark_streaming_new.py:170-173
(session_duration → Short/Medium/Long).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def categorize(
    col: Column | str,
    upper_bounds: Sequence[float],
    labels: Sequence[str],
) -> Column:
    """Chained when/otherwise: value < upper_bounds[i] → labels[i];
    else labels[-1]. len(labels) == len(upper_bounds) + 1.
    """
    if len(labels) != len(upper_bounds) + 1:
        raise ValueError("need exactly one more label than bounds")
    c = F.col(col) if isinstance(col, str) else col
    expr = F.when(c < upper_bounds[0], labels[0])
    for bound, label in zip(upper_bounds[1:], labels[1:-1]):
        expr = expr.when(c < bound, label)
    return expr.otherwise(labels[-1])
