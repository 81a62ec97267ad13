"""DDL generation for JDBC sinks: Spark schema → CREATE TABLE/INDEX.

Reference parity: web_traffic.sql:1-66 provisions MySQL tables
(typed columns, PRIMARY KEY, secondary indexes) that the streaming
job then writes into. This module completes that story for the JDBC
sink — the table a `write_jdbc` lands in can be created from the
DataFrame's own schema, instead of relying on the JDBC writer's
implicit CREATE (which picks lowest-common types and no indexes).

Statements are plain strings: execute them through any JDBC
connection (tests use Spark's own JVM DriverManager against the
bundled embedded Derby — a real database, no mocks).
"""

from __future__ import annotations

from pyspark.sql import types as T

# dialect → Spark type → SQL type (only where dialects differ)
_BASE_TYPES: dict[type, str] = {
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.DoubleType: "DOUBLE",
    T.BooleanType: "BOOLEAN",
    T.TimestampType: "TIMESTAMP",
    T.DateType: "DATE",
}
_DIALECT_OVERRIDES: dict[str, dict[type, str]] = {
    "mysql": {T.FloatType: "FLOAT", T.BinaryType: "BLOB", T.ByteType: "TINYINT"},
    "derby": {T.FloatType: "REAL", T.BinaryType: "BLOB", T.ByteType: "SMALLINT"},
    "ansi": {T.FloatType: "REAL", T.BinaryType: "VARBINARY(32672)", T.ByteType: "SMALLINT"},
}


def _sql_type(dtype: T.DataType, dialect: str, varchar_len: int) -> str:
    if isinstance(dtype, T.StringType):
        return f"VARCHAR({varchar_len})"
    if isinstance(dtype, T.DecimalType):
        return f"DECIMAL({dtype.precision},{dtype.scale})"
    over = _DIALECT_OVERRIDES[dialect]
    for t, name in {**_BASE_TYPES, **over}.items():
        if isinstance(dtype, t):
            return name
    raise ValueError(
        f"no {dialect} mapping for Spark type {dtype.simpleString()} "
        "(nested/array columns do not belong in a JDBC sink — flatten "
        "or serialize them first)"
    )


def create_table_ddl(
    schema: T.StructType,
    table: str,
    dialect: str = "mysql",
    primary_key: str | None = None,
    indexes: tuple[tuple[str, ...], ...] = (),
    varchar_len: int = 255,
) -> list[str]:
    """CREATE TABLE + CREATE INDEX statements for a Spark schema.

    ``indexes`` is a tuple of column tuples, one secondary index each
    (web_traffic.sql's KEY clauses). Returns a list of statements so
    callers can run them in one transaction or skip the indexes.
    """
    if dialect not in _DIALECT_OVERRIDES:
        raise ValueError(f"dialect must be one of {sorted(_DIALECT_OVERRIDES)}")
    cols = []
    for f in schema.fields:
        null = "" if f.nullable and f.name != primary_key else " NOT NULL"
        cols.append(f"  {f.name} {_sql_type(f.dataType, dialect, varchar_len)}{null}")
    if primary_key is not None:
        if primary_key not in schema.fieldNames():
            raise ValueError(f"primary_key {primary_key!r} not in schema")
        cols.append(f"  PRIMARY KEY ({primary_key})")
    stmts = [f"CREATE TABLE {table} (\n" + ",\n".join(cols) + "\n)"]
    for ix in indexes:
        missing = set(ix) - set(schema.fieldNames())
        if missing:
            raise ValueError(f"index columns {sorted(missing)} not in schema")
        stmts.append(
            f"CREATE INDEX idx_{table}_{'_'.join(ix)} ON {table} ({', '.join(ix)})"
        )
    return stmts
