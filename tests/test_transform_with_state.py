"""transformWithState (Spark 4 StatefulProcessor API): streaming
per-key ValueState equals the batch groupBy, including across
checkpoint-separated runs on the RocksDB state store."""

import pyspark.sql.functions as F
import pytest

from dbt_project_spark.sources import load_table
from dbt_project_spark.streaming.transform_state import user_stats_tws_stream
from tests.conftest import SF_SMOKE

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# transformWithState ships state-schema messages between the JVM and a
# dedicated Python driver worker over protobuf; the protobuf package is
# not installed in this sandbox (and installs are disallowed), so these
# tests document the contract and run wherever protobuf exists.
pytestmark = pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState requires the protobuf package (not in env)",
)


@pytest.fixture()
def rocksdb_state(spark):
    prev = spark.conf.get(PROVIDER_CONF)
    spark.conf.set(PROVIDER_CONF, ROCKSDB)
    yield
    spark.conf.set(PROVIDER_CONF, prev)


def test_tws_profile_matches_batch(spark, tmp_path, rocksdb_state):
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)

    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    q = (
        user_stats_tws_stream(raw)
        .writeStream.format("memory")
        .queryName("tws_profiles")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.table("tws_profiles")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value100").alias("total_value100"),
        )
    )
    want = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "total_value100"
        ),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_tws_state_survives_restart(spark, tmp_path, rocksdb_state):
    """Two availableNow runs over a growing source directory: the
    second run resumes the RocksDB state from the checkpoint, so final
    counts cover both halves."""
    src = str(tmp_path / "grow")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out")

    def half(lo, hi):
        return spark.range(lo, hi).select(
            F.lit(7).alias("user_id"), F.lit(2.5).alias("value")
        )

    def run():
        raw = spark.readStream.schema("user_id bigint, value double").parquet(
            src
        )
        q = (
            user_stats_tws_stream(raw)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, _e: df.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    half(0, 40).write.mode("append").parquet(src)
    run()
    half(40, 70).write.mode("append").parquet(src)
    run()

    final = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n"),
            F.max("total_value100").alias("v100"),
        )
        .collect()
    )
    assert len(final) == 1
    assert (final[0].user_id, final[0].n, final[0].v100) == (7, 70, 70 * 250)
