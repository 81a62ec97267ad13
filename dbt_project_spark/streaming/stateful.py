"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for semantics Spark's built-in streaming aggregations
can't express: arbitrary per-key state evolving across micro-batches.
Here: a per-user running profile (event count, value sum, last-seen
epoch) that emits the updated profile for every key touched in a
micro-batch — the building block for online feature stores and
streaming sessionization.

Scale notes: state lives in the state store, partitioned by the
grouping key — the shuffle is on user_id and state size is O(distinct
keys), not O(events). GroupStateTimeout can expire idle keys
(bounding state for high-churn key spaces); timeouts are disabled
here because the test driver uses availableNow termination.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = "user_id bigint, n_events bigint, total_value100 bigint, last_epoch bigint"
STATE_SCHEMA = "n bigint, total bigint, last bigint"


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Per-user running profile over a STREAMING events DataFrame.

    ``applyInPandasWithState`` is streaming-only (batch queries raise
    UnsupportedOperationException — use a plain groupBy there, which
    is exactly what the parity tests compare against: availableNow
    streaming output == batch groupBy).
    """
    # Defined NESTED so cloudpickle serializes it by value: a module-
    # top-level function ships by reference and requires
    # dbt_project_spark to be importable inside every Python worker —
    # which a driver that only sys.path-inserted the repo won't have.
    def update_profile(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, last = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += int(pdf["value100"].sum())
            last = max(last, int(pdf["epoch"].max()))
        state.update((n, total, last))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_events": n,
                    "total_value100": total,
                    "last_epoch": last,
                }
            ]
        )

    prepped = events.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("value100"),
        F.unix_timestamp("ts").alias("epoch"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
