"""Python UDTF (Spark 4 user-defined table function) coverage: the
lateral table-function API — one of the two Python extension surfaces
(the other, transformWithState, is protobuf-gated in this env).

UDTFs are a row-at-a-time Python path, so the repo uses them only
where a table-valued lateral expansion is genuinely per-row imperative
(the JVM chunker in queries_text stays the hot path); this locks the
API contract: registration, LATERAL join correlation, terminate().
"""

import pytest

try:
    from pyspark.sql.functions import udtf  # noqa: F401

    _HAS_UDTF = True
except ImportError:  # pragma: no cover - older pyspark
    _HAS_UDTF = False

pytestmark = pytest.mark.skipif(not _HAS_UDTF, reason="no UDTF API")


def test_udtf_lateral_chunker(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk: string, idx: int")
    class Chunker:
        def eval(self, text: str, size: int):
            for i in range(0, len(text or ""), size):
                yield text[i : i + size], i // size

    spark.udtf.register("chunker_udtf", Chunker)
    spark.createDataFrame(
        [(1, "abcdefgh"), (2, "xyz"), (3, None)], ["id", "txt"]
    ).createOrReplaceTempView("udtf_t")
    rows = spark.sql(
        """
        SELECT t.id, c.idx, c.chunk
        FROM udtf_t t, LATERAL chunker_udtf(t.txt, 4) c
        ORDER BY t.id, c.idx
        """
    ).collect()
    got = [(r["id"], r["idx"], r["chunk"]) for r in rows]
    assert got == [(1, 0, "abcd"), (1, 1, "efgh"), (2, 0, "xyz")]


def test_udtf_terminate_emits_summary(spark):
    """terminate() flushes per-partition state — the UDTF analogue of
    a map-side combine."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="kind: string, n: bigint")
    class CountTail:
        def __init__(self):
            self.n = 0

        def eval(self, x: int):
            self.n += 1

        def terminate(self):
            yield "partition_total", self.n

    spark.udtf.register("count_tail", CountTail)
    spark.range(100).coalesce(1).createOrReplaceTempView("udtf_r")
    rows = spark.sql(
        "SELECT c.kind, c.n FROM count_tail(TABLE(udtf_r)) c"
    ).collect()
    assert [(r["kind"], r["n"]) for r in rows] == [("partition_total", 100)]
