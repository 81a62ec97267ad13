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

SESSION_SCHEMA = (
    "user_id bigint, session_start bigint, session_end bigint, n_events bigint"
)
SESSION_STATE_SCHEMA = "start bigint, last bigint, n bigint"
SESSION_GAP_SEC = 1800


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


def session_stream(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Custom stateful sessionizer: CLOSED gap-based sessions, in
    append mode, via ``applyInPandasWithState`` + EventTimeTimeout.

    Semantics match the batch `sessionization` catalog query: a new
    session starts when the gap between consecutive events of a user
    exceeds ``gap_sec`` (strict, in floor-epoch seconds). A session is
    emitted only once it is CLOSED — either by a later in-batch event
    beyond the gap, or by the event-time watermark passing
    session_end + gap (state timeout — the "user went away" case that
    native ``session_window`` handles internally and this operator
    must handle explicitly).

    State per user is ONE open session (3 int64s) regardless of event
    volume; the shuffle key is user_id. The input stream must carry a
    watermark (timeouts are driven by it).
    """

    # Nested for cloudpickle by-value serialization (see above).
    def update_sessions(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        gap = gap_sec

        def closed_row(start: int, last: int, n: int) -> dict[str, int]:
            return {
                "user_id": key[0],
                "session_start": start,
                "session_end": last,
                "n_events": n,
            }

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([closed_row(start, last, n)])
            return

        eps: list[int] = []
        for pdf in pdfs:
            eps.extend(int(e) for e in pdf["epoch"])
        eps.sort()

        open_sess = state.get if state.exists else None
        out: list[dict[str, int]] = []
        for ep in eps:
            if open_sess is None:
                open_sess = (ep, ep, 1)
            elif ep - open_sess[1] > gap:
                out.append(closed_row(*open_sess))
                open_sess = (ep, ep, 1)
            else:
                open_sess = (open_sess[0], max(open_sess[1], ep), open_sess[2] + 1)

        wm_ms = state.getCurrentWatermarkMs()
        if open_sess is not None:
            close_at_ms = (open_sess[1] + gap) * 1000
            if close_at_ms <= wm_ms:
                # Watermark already passed the gap horizon: the session
                # can never be extended — close it now (setting a
                # timeout before the watermark is illegal anyway).
                out.append(closed_row(*open_sess))
                if state.exists:
                    state.remove()
            else:
                state.update(open_sess)
                state.setTimeoutTimestamp(close_at_ms)
        if out:
            yield pd.DataFrame(out)

    prepped = events.select(
        events["user_id"],
        F.col("ts"),
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("epoch"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        update_sessions,
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
