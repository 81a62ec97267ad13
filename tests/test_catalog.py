"""Catalog contract tests + full oracle gate at smoke scale.

The oracle gate replicates the driver's correctness check (row count,
column names, order-insensitive values vs DuckDB) for EVERY registered
query at sf0.001 — the reference's test strategy (stream-vs-batch
comparison) generalized to engine-vs-ANSI-oracle.
"""

import pytest

from dbt_project_spark.catalog import (
    ORACLES,
    QUERIES,
    REFRESH,
    driver_green,
    load_all,
    ordered_queries,
    priority_names,
)
from dbt_project_spark.oracle_check import check_query, duckdb_conn
from tests.conftest import SF_SMOKE

load_all()


def test_every_query_has_oracle_or_is_documented():
    missing = set(QUERIES) - set(ORACLES)
    # rows-only entries must be deliberate; currently all queries have oracles
    assert missing == set()


def test_priority_order_is_well_formed():
    # No duplicates, and reordering loses no queries.
    names = priority_names()
    assert len(names) == len(set(names))
    ordered = ordered_queries()
    assert list(ordered) == names
    assert set(ordered) == set(QUERIES)
    assert set(REFRESH) <= set(QUERIES), sorted(set(REFRESH) - set(QUERIES))


def test_driver_window_covers_debt():
    """The driver's 50-query window must hard-gate driver-unverified
    queries while debt remains (VERDICT r05 task 1: the manually
    curated window went stale two rounds running; the order is now
    derived from the checked-in CORRECTNESS_r*.json at import)."""
    green = driver_green()
    debt = [n for n in QUERIES if n not in green]
    window = list(ordered_queries())[:50]
    # REFRESH names are allowed in the window even if driver-green:
    # their semantics changed, so the old verdict is stale.
    stale_green = set(window) & (set(green) - set(REFRESH))
    if len(debt) + len(set(REFRESH) & set(QUERIES)) >= 50:
        assert not stale_green, sorted(stale_green)
    else:
        # Debt no longer fills the window — every debt name must be in it.
        assert set(debt) <= set(window), sorted(set(debt) - set(window))


def test_green_tail_orders_stalest_verdict_first(tmp_path, monkeypatch):
    """VERDICT r09 task 4: with driver debt at zero, the window must
    burn the names whose latest green verdict is OLDEST — registration
    order would re-verify the freshest names forever."""
    import json

    from dbt_project_spark import catalog

    some = list(QUERIES)[:4]
    old_round = {some[2]: 1, some[3]: 2}  # stale pair, reversed reg order
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {some[2]: {"err": None, "rows_match": True, "hash_match": True}}
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {some[3]: {"err": None, "rows_match": True, "hash_match": True}}
        )
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps(
            {
                n: {"err": None, "rows_match": True, "hash_match": True}
                for n in QUERIES
                if n not in old_round
            }
        )
    )
    monkeypatch.setattr(catalog, "_repo_root", lambda: tmp_path)
    catalog.driver_green.cache_clear()
    catalog.green_rounds.cache_clear()
    try:
        names = catalog.priority_names()
        window = names[: len(catalog.REFRESH) + 2]
        # the two stale names lead the tail, oldest verdict first,
        # regardless of registration order
        assert window[-2:] == [some[2], some[3]]
    finally:
        catalog.driver_green.cache_clear()
        catalog.green_rounds.cache_clear()


def test_driver_green_latest_verdict_wins(tmp_path, monkeypatch):
    """ADVICE r06: a query green in an early round but red in a later
    round must count as debt again (re-enter the driver window), not
    stay 'verified' via a green-in-any-round union."""
    import json

    from dbt_project_spark import catalog

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "q_regressed": {"err": None, "rows_match": True, "hash_match": True},
                "q_recovered": {"err": "boom", "rows_match": False},
                "q_stays_green": {"err": None, "rows_match": True},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "q_regressed": {"err": None, "rows_match": True, "hash_match": False},
                "q_recovered": {"err": None, "rows_match": True, "hash_match": True},
            }
        )
    )
    monkeypatch.setattr(catalog, "_repo_root", lambda: tmp_path)
    catalog.driver_green.cache_clear()
    catalog.green_rounds.cache_clear()  # r10: verdict parsing lives here
    try:
        green = catalog.driver_green()
        assert "q_regressed" not in green  # red in r02 overrides green r01
        assert "q_recovered" in green  # green in r02 overrides red r01
        assert "q_stays_green" in green  # untouched later rounds keep verdict
    finally:
        catalog.driver_green.cache_clear()
        catalog.green_rounds.cache_clear()


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
