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


def reclaim_jvm() -> None:
    """Reclaim JVM heap that ``unpersist`` cannot touch.

    ``localCheckpoint`` blocks (the lineage-truncation convention in the
    iterative graph/CC/BPE operators) are NOT freed by unpersisting the
    DataFrame: Spark's ContextCleaner releases them only once the
    checkpointed RDD object is unreachable AND a JVM GC enqueues its
    weak reference. In a long single-JVM session the Python-side py4j
    proxies keep thousands of Dataset/plan objects reachable until
    Python's own GC runs, so neither collector ever fires and the heap
    fills with dead checkpoint blocks and analyzed plan trees (r07: the
    full 867-test suite OOM'd an 8g driver 39 minutes in, inside a
    kcore ``localCheckpoint`` — with per-module ``release_tracked``
    already in place).

    Fix: collect Python first (drops py4j proxies, which detaches the
    JVM objects), then ask the JVM for a full GC so ContextCleaner can
    sweep. Costs one full GC (~0.1-0.5 s on an 8g heap) — callers place
    it OUTSIDE timed regions (test module teardown, oracle-gate loop,
    bench pass boundaries), never inside a measured query."""
    import gc

    gc.collect()
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            s._jvm.System.gc()
    except Exception:  # no active session / JVM gone — nothing to do
        pass
