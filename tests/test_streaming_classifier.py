"""Online classifier scoring on Structured Streaming (r5s4): a
stream of incoming documents scored in foreachBatch against the
Naive Bayes model trained in batch — the production quality-filter
topology (train once offline, score every crawled micro-batch
online). Parity gate: streamed predictions must equal the batch
scoring path (nb_lang_classifier's dataflow) on the same documents."""

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_streaming_nb_scoring_matches_batch(spark, tmp_path):
    from dbt_project_spark.queries_training import (
        NB_TEST_MOD,
        _nb_model,
        _nb_predict,
        nb_bucketize,
    )
    from dbt_project_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "text"
    )
    incoming = docs.filter(F.col("doc_id") % NB_TEST_MOD == 0)
    # batch reference: the registered query's own scoring path
    bt, lam, prior, nc = _nb_model(spark, SF)
    expected = {
        (r["doc_id"], r["pred_lang"])
        for r in _nb_predict(
            bt.filter(F.col("doc_id") % NB_TEST_MOD == 0), lam, prior, nc
        ).collect()
    }
    assert expected, "test split should be non-empty"

    # document stream: two micro-batch files
    src = str(tmp_path / "dsrc")
    mid = incoming.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[
        0
    ][0]
    incoming.filter(F.col("doc_id") <= mid).write.parquet(
        os.path.join(src, "b0")
    )
    incoming.filter(F.col("doc_id") > mid).write.parquet(
        os.path.join(src, "b1")
    )
    out = str(tmp_path / "out")

    def serve(batch_df, batch_id):
        ss = batch_df.sparkSession
        _bt, blam, bprior, bnc = _nb_model(ss, SF)
        _nb_predict(nb_bucketize(batch_df), blam, bprior, bnc).write.mode(
            "append"
        ).parquet(out)

    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(serve)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["pred_lang"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == expected
