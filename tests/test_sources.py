"""Source reader tests: CSV / JSON round-trips, registry guards."""

import pytest

from dbt_project_spark.sources import TABLES, load_table, register_views
from dbt_project_spark.sources.readers import read_csv, read_json
from tests.conftest import SF_SMOKE


def test_registry_loads_all_tables(spark):
    for t in TABLES:
        df = load_table(spark, SF_SMOKE, t)
        assert df.count() > 0, t


def test_registry_rejects_unknown(spark):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, SF_SMOKE, "nope")


def test_register_views_sql(spark):
    register_views(spark, SF_SMOKE, ["region", "nation"])
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey"
    ).collect()[0]["n"]
    assert n == 25


def test_events_ts_is_timestamp(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_csv_roundtrip(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_csv")
    src.write.option("header", "true").csv(path)
    back = read_csv(spark, path, schema=src.schema)
    assert back.count() == 25
    assert back.exceptAll(src).count() == 0


def test_json_roundtrip(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "region")
    path = str(tmp_path / "region_json")
    src.write.json(path)
    back = read_json(spark, path, schema=src.schema)
    assert back.exceptAll(src).count() == 0


def test_csv_reader_kafka_message_shape(spark, tmp_path):
    """The reference's CSV → topic messages shape (kafka_producer.py)."""
    p = tmp_path / "traffic.csv"
    p.write_text(
        "Page Views,Session Duration,Time on Page,timestamp\n"
        "3,120.5,45.2,2024-01-01 00:00:01\n"
        "1,30.0,10.0,2024-01-01 00:00:02\n"
    )
    df = read_csv(spark, str(p))
    assert df.count() == 2
    assert "Page Views" in df.columns


def test_orc_roundtrip(spark, tmp_path):
    from dbt_project_spark.sources.readers import read_orc, write_orc

    df = spark.range(0, 100).selectExpr(
        "id", "id % 7 AS grp", "CAST(id * 1.5 AS DOUBLE) AS v"
    )
    path = str(tmp_path / "orc")
    write_orc(df, path, partition_by="grp")
    back = read_orc(spark, path)
    assert back.count() == 100
    assert {r[0] for r in back.select("grp").distinct().collect()} == set(range(7))
    # partition pruning: the grp filter is a hive-partition predicate
    filtered = back.filter("grp = 3")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert filtered.count() == 14  # ids ≡ 3 (mod 7) in [0, 100)


def test_text_reader_line_and_whole(spark, tmp_path):
    from dbt_project_spark.sources.readers import read_text

    p = tmp_path / "docs.txt"
    p.write_text("line one\nline two\nline three\n")
    lines = read_text(spark, str(p))
    assert lines.count() == 3
    whole = read_text(spark, str(p), whole_file=True)
    assert whole.count() == 1
    assert "line two" in whole.collect()[0][0]


def test_binary_file_reader(spark, tmp_path):
    from dbt_project_spark.sources.readers import read_binary_files

    (tmp_path / "a.bin").write_bytes(b"\x00\x01\x02\x03")
    (tmp_path / "b.bin").write_bytes(b"\xff" * 10)
    (tmp_path / "skip.txt").write_text("not binary payload")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {r["path"].split("/")[-1]: r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert rows["a.bin"]["length"] == 4
    assert bytes(rows["b.bin"]["content"]) == b"\xff" * 10


def test_xml_roundtrip(spark, tmp_path):
    from dbt_project_spark.sources.readers import read_xml, write_xml

    df = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_xml")
    write_xml(df, path, row_tag="nation", root_tag="nations")
    back = read_xml(spark, path, row_tag="nation")
    assert back.count() == df.count()
    a = sorted((r.n_nationkey, r.n_name) for r in df.collect())
    b = sorted((r.n_nationkey, r.n_name) for r in back.collect())
    assert a == b
