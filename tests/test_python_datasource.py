"""Python DataSource API (Spark 4): the synth_events generator plans
real partitions, generates deterministically, and absorbs EqualTo
pushdown into generation."""

import pyspark.sql.functions as F
import pytest

from dbt_project_spark.sources.pysource import (
    EVENT_TYPES,
    _row,
    register_synth_source,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_synth_source(spark)
    conf = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(conf, "false")
    spark.conf.set(conf, "true")
    yield
    spark.conf.set(conf, prev)


def _read(spark, **opts):
    r = spark.read.format("synth_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_rowcount_and_schema(spark):
    df = _read(spark, rows=500, parts=3)
    assert df.count() == 500
    assert df.columns == ["event_id", "user_id", "event_type", "value"]


def test_partition_planning(spark):
    df = _read(spark, rows=100, parts=7)
    assert df.rdd.getNumPartitions() == 7
    # strided id ranges are disjoint and complete
    assert df.agg(F.countDistinct("event_id")).collect()[0][0] == 100


def test_deterministic_across_partitionings(spark):
    a = _read(spark, rows=200, parts=2).collect()
    b = _read(spark, rows=200, parts=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # and matches the generator function directly
    assert sorted(map(tuple, a))[:3] == [_row(i) for i in range(3)]


def test_equalto_pushdown_matches_post_filter(spark):
    pushed = _read(spark, rows=1000, parts=4).filter(
        F.col("event_type") == "click"
    )
    # correctness: pushdown-generated rows == full generation + filter
    want = [r for i in range(1000) if (r := _row(i))[2] == "click"]
    got = sorted(map(tuple, pushed.collect()))
    assert got == sorted(want)
    assert len(got) > 0


def test_unsupported_filter_still_correct(spark):
    # value > threshold is NOT absorbed by the source; Spark must
    # apply it post-scan and results stay exact
    df = _read(spark, rows=300, parts=2).filter(F.col("value") > 500.0)
    want = [r for i in range(300) if (r := _row(i))[3] > 500.0]
    assert sorted(map(tuple, df.collect())) == sorted(want)


def test_types_cover_reference_vocabulary(spark):
    got = {
        r.event_type
        for r in _read(spark, rows=2000, parts=4)
        .select("event_type")
        .distinct()
        .collect()
    }
    assert got == set(EVENT_TYPES)


def test_streaming_source_deterministic_prefix(spark, tmp_path):
    """The Python streaming source (SimpleDataSourceStreamReader)
    emits the SAME deterministic rows as the batch table, as a gapless
    dup-free id prefix — the exactly-once-replay property a real
    Kafka source gets from the broker log, here from generation being
    a pure function of the id."""
    import time

    from dbt_project_spark.sources.pysource import _row, register_synth_source

    register_synth_source(spark)
    stream = (
        spark.readStream.format("synth_events")
        .option("batchrows", 50)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.table("synth_stream").count()
            if n >= 100:  # at least two micro-batches
                break
            time.sleep(0.3)
    finally:
        q.stop()
    got = sorted(
        spark.table("synth_stream").collect(), key=lambda r: r["event_id"]
    )
    assert len(got) >= 100
    ids = [r["event_id"] for r in got]
    assert ids == list(range(len(ids)))  # gapless, dup-free prefix
    for r in got[:60]:
        i, u, t, v = _row(r["event_id"])
        assert (r["user_id"], r["event_type"], r["value"]) == (u, t, v)
