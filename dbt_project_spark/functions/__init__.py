from dbt_project_spark.functions.expressions import (
    cosine_similarity,
    dot_product,
    engagement_score,
    l2_norm,
    md5_int,
    window_bounds,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "engagement_score",
    "l2_norm",
    "md5_int",
    "window_bounds",
]
