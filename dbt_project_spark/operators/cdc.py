"""Change-data-capture: snapshot diff between two table versions.

The shape dbt snapshots / MERGE-source computation runs daily: given
yesterday's snapshot and today's, emit one row per changed key with
op ∈ {I, U, D} and the list of changed columns. Reference parity: the
reference's MySQL pipeline re-loads full tables per run
(mysql_infra.sql DDL, no incremental path); this operator is the
incremental contract a warehouse needs at scale instead.

Scale: ONE full-outer shuffle join on the key — both sides partition
by key, no broadcast (both snapshots are table-sized), AQE handles
skewed keys. Column comparison is null-safe equality inside codegen;
the changed-column list is built with ``concat_ws``, which skips NULL
arguments identically in Spark and DuckDB (so the oracle mirrors it
1:1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str],
) -> DataFrame:
    """Diff two snapshots by ``keys``.

    Returns one row per inserted (I), deleted (D), or updated (U) key:
    ``keys..., op, {c}_old, {c}_new ... , changed`` where ``changed``
    is the comma-joined list of compare columns whose values differ
    (empty for I/D; U rows with no differing column are dropped —
    they're not changes).
    """
    o = old.select(
        *keys,
        *[F.col(c).alias(f"{c}_old") for c in compare],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"{c}_new") for c in compare],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, on=list(keys), how="full_outer")
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .otherwise(F.lit("U"))
    )
    # concat_ws skips NULL args, so each unchanged column contributes
    # nothing; changed is defined only for U rows (I/D compare
    # null-vs-value, which is not a column change).
    changed = F.when(
        op == "U",
        F.concat_ws(
            ",",
            *[
                F.when(
                    ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")),
                    F.lit(c),
                )
                for c in compare
            ],
        ),
    ).otherwise(F.lit(""))
    out = j.withColumn("op", op).withColumn("changed", changed)
    return out.filter(
        (F.col("op") != "U") | (F.col("changed") != "")
    ).select(
        *keys,
        "op",
        "changed",
        *[f"{c}_old" for c in compare],
        *[f"{c}_new" for c in compare],
    )
