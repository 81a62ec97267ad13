"""Tracked-persistence registry + JVM reclamation smoke tests.

reclaim_jvm's actual effect (ContextCleaner freeing localCheckpoint
blocks) is asynchronous and heap-dependent — the full-suite OOM it
fixes is only observable over a ~40-minute run, so these tests pin the
CONTRACT (runs cleanly in every session state, registry drains, plans
stay recomputable after release) rather than block counts.
"""

from dbt_project_spark.caching import (
    _TRACKED,
    persist_tracked,
    release_tracked,
    reclaim_jvm,
)


def test_release_tracked_drains_registry(spark):
    df = persist_tracked(spark.range(100))
    assert df.count() == 100
    assert len(_TRACKED) >= 1
    n = release_tracked()
    assert n >= 1
    assert _TRACKED == []
    # released plans stay recomputable (lineage intact)
    assert df.count() == 100


def test_reclaim_jvm_with_checkpointed_plan(spark):
    # the shape that leaked in the full suite: persist + localCheckpoint,
    # then release — reclaim must run clean and leave live plans usable
    df = persist_tracked(spark.range(1000).localCheckpoint(eager=False))
    assert df.count() == 1000
    release_tracked()
    reclaim_jvm()
    assert spark.range(10).count() == 10  # session still healthy


def test_reclaim_jvm_is_always_safe(spark):
    # idempotent, callable back-to-back and with nothing tracked
    release_tracked()
    reclaim_jvm()
    reclaim_jvm()
    assert release_tracked() == 0
