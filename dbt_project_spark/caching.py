"""Tracked persistence: a session-wide registry of persisted intermediates.

Operators persist intermediates (edge lists, LSH band projections,
shingle postings) that outlive the function that created them — the
returned lazy plan still references them, so the creator can never
safely unpersist. Without a release point a 100+-query gate or bench
session accumulates MEMORY_AND_DISK blocks without bound (ADVICE r02).

``persist_tracked`` persists and registers a DataFrame;
``release_tracked`` unpersists everything registered. The catalog's
``register`` wrapper calls ``release_tracked`` as each NEW query is
built: every consumer (driver gate, local oracle gate, bench, CLI)
builds then materializes one query before building the next, so by the
time query N+1 is constructed, query N's intermediates are dead.

Releasing is never a correctness risk: unpersisting an
already-collected (or even still-lazy) plan only means a re-execution
would recompute — Spark keeps the lineage. Double-unpersist (some
operators release their own per-round intermediates eagerly) is a
no-op.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + register for the next ``release_tracked``."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame; returns how many were live."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    _TRACKED.clear()
    return n
