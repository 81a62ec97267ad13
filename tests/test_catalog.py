"""Catalog contract tests + full oracle gate at smoke scale.

The oracle gate replicates the driver's correctness check (row count,
column names, order-insensitive values vs DuckDB) for EVERY registered
query at sf0.001 — the reference's test strategy (stream-vs-batch
comparison) generalized to engine-vs-ANSI-oracle.
"""

import pytest

from dbt_project_spark.catalog import ORACLES, QUERIES, load_all
from dbt_project_spark.oracle_check import check_query
from tests.conftest import SF_SMOKE

load_all()


def test_every_query_has_oracle_or_is_documented():
    missing = set(QUERIES) - set(ORACLES)
    # rows-only entries must be deliberate; currently all queries have oracles
    assert missing == set()


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, name):
    r = check_query(spark, SF_SMOKE, name, QUERIES[name], ORACLES.get(name))
    assert r["ok"], r
