"""Format readers beyond parquet: CSV, JSON lines, JDBC (gated).

Reference parity: data_input.py loads a CSV (pandas → MySQL row
loop); kafka_consumer.py reassembles JSON topic messages into rows.
Spark-first: declarative schema-on-read, distributed, pushdown-
capable; the per-row Python loop becomes a single scan.

Scale notes: always pass an explicit schema in production paths —
``inferSchema`` reads the data twice; CSV/JSON scans parallelize by
file split, and the JDBC reader only parallelizes with
partitionColumn bounds (otherwise it is one executor pulling the
whole table through one connection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV reader (data_input.py parity, distributed)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")  # dev only: 2 passes
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    """JSON-lines reader (the Kafka message payload shape, at rest)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "com.mysql.cj.jdbc.Driver",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """JDBC source (web_traffic.sql's raw_traffic_data shape).

    With partition bounds the read fans out to num_partitions parallel
    range queries; without them it is single-connection. Live-tested
    against embedded Derby (tests/test_jdbc.py: 4-way partitioned
    read, even split, round-trip equality); MySQL needs only its
    driver jar + url.
    """
    try:
        reader = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("driver", driver)
            .option("dbtable", table)
            .option("user", user)
            .option("password", password)
        )
        if partition_column is not None:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("lowerBound", str(lower_bound))
                .option("upperBound", str(upper_bound))
                .option("numPartitions", str(num_partitions))
            )
        return reader.load()
    except Exception as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            f"JDBC source unavailable (driver {driver} jar + reachable DB "
            f"required; url={url}): {e}"
        ) from e


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC reader — same columnar pushdown/pruning story as parquet
    (predicate pushdown, column projection, split-parallel scans);
    included so warehouses standardized on ORC can swap formats
    without touching query code."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None):
    """ORC writer (optionally hive-partitioned, like the parquet sink)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(
            *([partition_by] if isinstance(partition_by, str) else partition_by)
        )
    writer.orc(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row", **options
) -> DataFrame:
    """XML reader (Spark 4 built-in spark-xml): one row per ``row_tag``
    element, schema inferred or supplied. The B2B/legacy-feed
    ingestion path — at scale the same splittable-file story as JSON
    lines does NOT hold for one giant document (a single XML document
    parses on one task), so land many medium files, not one huge one."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    row_tag: str = "row",
    root_tag: str = "rows",
):
    """XML writer (Spark 4 built-in): one file per partition, each a
    ``root_tag`` document of ``row_tag`` elements."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def read_text(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    """Raw text reader: one row per line (or per file) in a `value`
    column — the ingestion path for crawl dumps before any parsing.
    Line mode splits by file block, so a single huge file still fans
    out across executors."""
    return spark.read.text(path, wholetext=whole_file)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """binaryFile reader: (path, modificationTime, length, content)
    per file — the multimodal ingest path (images/audio land as
    opaque `content` bytes + metadata, then flow into the
    mapInPandas feature extractors in operators/multimodal.py).

    Scale note: each file becomes one row read by one task; the
    format is for many-small-object corpora (it refuses files >
    spark.sql.sources.binaryFile.maxLength, default 2^31-1). Column
    pruning applies — selecting only `path`/`length` never reads
    file bytes."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
