"""Sink builders: parquet (partitioned), CSV, JDBC (gated).

The reference writes every analytic to MySQL via JDBC
(spark_streaming_new.py:126-223). ``write_jdbc`` is live-tested
against the Spark-bundled embedded Derby (tests/test_jdbc.py) —
MySQL itself is reachable by swapping url+driver. Parquet sinks are
the cluster-native equivalent (columnar, partition-pruned,
object-store friendly) and what the analytics pipeline tests
exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame, path: str, mode: str = "append", partition_by: str | None = None
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "com.mysql.cj.jdbc.Driver",
    mode: str = "append",
) -> None:
    """JDBC sink (reference parity: spark_streaming_new.py:126-134).

    Requires the driver jar on the classpath and a reachable DB."""
    try:
        (
            df.write.format("jdbc")
            .option("url", url)
            .option("driver", driver)
            .option("dbtable", table)
            .option("user", user)
            .option("password", password)
            .mode(mode)
            .save()
        )
    except Exception as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            f"JDBC sink unavailable (driver {driver} jar + reachable DB "
            f"required; url={url}): {e}"
        ) from e
