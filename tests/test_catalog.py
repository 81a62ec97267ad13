"""Catalog contract tests + full oracle gate at smoke scale.

The oracle gate replicates the driver's correctness check (row count,
column names, order-insensitive values vs DuckDB) for EVERY registered
query at sf0.001 — the reference's test strategy (stream-vs-batch
comparison) generalized to engine-vs-ANSI-oracle.
"""

import pytest

from dbt_project_spark.catalog import (
    ORACLES,
    PRIORITY,
    QUERIES,
    load_all,
    ordered_queries,
)
from dbt_project_spark.oracle_check import check_query, duckdb_conn
from tests.conftest import SF_SMOKE

load_all()


def test_every_query_has_oracle_or_is_documented():
    missing = set(QUERIES) - set(ORACLES)
    # rows-only entries must be deliberate; currently all queries have oracles
    assert missing == set()


def test_priority_order_is_well_formed():
    # No stale names, no duplicates, and reordering loses no queries.
    assert set(PRIORITY) <= set(QUERIES), sorted(set(PRIORITY) - set(QUERIES))
    assert len(PRIORITY) == len(set(PRIORITY))
    ordered = ordered_queries()
    assert list(ordered)[: len(PRIORITY)] == [n for n in PRIORITY if n in QUERIES]
    assert set(ordered) == set(QUERIES)


def test_no_hugeint_oracle_columns():
    """The driver's value hasher serializes DuckDB HUGEINT (int128)
    differently from Spark BIGINT even for equal values (r01: tpch_q1/
    q18 false reds). Guard: no oracle may emit a 128-bit column."""
    con = duckdb_conn(SF_SMOKE)
    bad = {}
    for name, sql in ORACLES.items():
        types = [
            str(row[1]).upper()
            for row in con.execute(f"DESCRIBE ({sql})").fetchall()
        ]
        wide = [t for t in types if "HUGEINT" in t or "INT128" in t]
        if wide:
            bad[name] = wide
    assert not bad, bad


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, name):
    r = check_query(spark, SF_SMOKE, name, QUERIES[name], ORACLES.get(name))
    assert r["ok"], r


def test_tracked_caches_released_at_next_query_build(spark):
    """Operators persist intermediates the caller's plan still needs
    (postings, edge lists); the catalog entry releases them when the
    NEXT query is built, so a long gate/bench session cannot
    accumulate cache blocks (ADVICE r02)."""
    from dbt_project_spark import caching

    QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
    assert len(caching._TRACKED) > 0  # postings still registered
    # Building any other catalog query drops the previous query's
    # caches; tpch_q6 itself persists nothing.
    QUERIES["tpch_q6"](spark, SF_SMOKE).collect()
    assert len(caching._TRACKED) == 0


def test_doc_counts_match_catalog():
    """r04 judge task: README/SURVEY query counts must equal the live
    catalog size — counts drifted twice in earlier rounds; this pins
    them to len(QUERIES) so a new registration without a doc bump
    fails CI."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = len(QUERIES)
    readme = open(os.path.join(repo, "README.md")).read()
    m = re.search(r"(\d+) oracle-verified queries", readme)
    assert m and int(m.group(1)) == n, (m and m.group(1), n)
    survey = open(os.path.join(repo, "SURVEY.md")).read()
    m = re.search(r"Catalog size: (\d+) oracled queries", survey)
    assert m and int(m.group(1)) == n, (m and m.group(1), n)
