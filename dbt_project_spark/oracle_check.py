"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
(order-insensitively, columns sorted by name) the values. Used by
tests and by `python -m dbt_project_spark.oracle_check [sf_dir]`.
"""

from __future__ import annotations

import math
import sys

import duckdb

from pyspark.sql.types import ArrayType, MapType, StructType

from dbt_project_spark.sources.registry import TABLES


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full round-trip precision (17 sig digits): the gate must be
        # at least as strict as a bitwise hash. Only -0.0 is folded.
        if v == 0:
            v = 0.0
        return f"{v:.17g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def check_query(spark, sf_dir: str, name: str, query_fn, oracle: str | None):
    """Returns dict with rows/cols/match info; oracle=None → rows-only."""
    sdf = query_fn(spark, sf_dir)
    # Scalar-schema contract: the driver's hash gate canonicalizes rows
    # in pandas, where array/map/struct cells are unhashable (r03:
    # inverted_index err). Every catalog query must emit scalars only —
    # string-encode lists (concat_ws / array_to_string) on both sides.
    nested = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    srows = sdf.collect()
    scols = sdf.columns
    result = {
        "name": name,
        "spark_rows": len(srows),
        "spark_cols": sorted(scols),
        "oracle": oracle is not None,
    }
    if nested:
        result["nested_cols"] = nested
        result["ok"] = False
        return result
    if oracle is None:
        result["ok"] = True
        return result
    con = duckdb_conn(sf_dir)
    # Path-bearing oracles (table_file_stats) are baked at the
    # driver's sf0.01; re-point them at the sf under local test.
    cur = con.execute(oracle.replace("/root/testdata/sf0.01", sf_dir))
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    result["oracle_rows"] = len(orows)
    result["cols_match"] = sorted(scols) == sorted(ocols)
    if not result["cols_match"]:
        result["oracle_cols"] = sorted(ocols)
        result["ok"] = False
        return result
    a = _canon([tuple(r) for r in srows], scols)
    b = _canon(orows, ocols)
    result["rows_match"] = len(a) == len(b)
    result["values_match"] = a == b
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        only_a = [x for x in a if x not in set(b)][:3]
        only_b = [x for x in b if x not in set(a)][:3]
        result["sample_diff"] = diff or list(zip(only_a, only_b))
    result["ok"] = bool(result["rows_match"] and result["values_match"])
    return result


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    from dbt_project_spark import get_spark
    from dbt_project_spark.catalog import ORACLES, QUERIES, load_all

    load_all()
    spark = get_spark()
    failures = 0
    from dbt_project_spark.caching import reclaim_jvm

    checked = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        # A 300+-query sweep in one JVM accumulates localCheckpoint
        # blocks / plan trees that unpersist can't free — sweep
        # periodically (see caching.reclaim_jvm; this loop is untimed).
        checked += 1
        if checked % 25 == 0:
            reclaim_jvm()
        try:
            r = check_query(spark, sf_dir, name, fn, ORACLES.get(name))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        status = "ok  " if r["ok"] else "FAIL"
        extra = "" if r["ok"] else f" {r}"
        kind = "oracle" if r["oracle"] else "rows-only"
        print(f"{status} {name} [{kind}] rows={r['spark_rows']}{extra}")
        failures += 0 if r["ok"] else 1
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # All trailing args are query names, comma- or space-separated —
    # silently dropping argv[3:] made "gated" queries never run
    # (ADVICE r07).
    only = [n for a in sys.argv[2:] for n in a.split(",") if n] or None
    if only:
        from dbt_project_spark.catalog import QUERIES, load_all

        load_all()
        unknown = [n for n in only if n not in QUERIES]
        if unknown:
            raise SystemExit(f"unknown query names: {unknown}")
    raise SystemExit(1 if main(sf, only) else 0)
