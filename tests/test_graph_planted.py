"""Planted-graph tests for the graph catalog family (r06 lint
burn-down). Three hand-computable fixtures:

- trade fixture A (nations 0..3, edges 0→1, 1→0, 0→2, 2→3): BFS
  hops, reciprocity (2 of 4 edges mutual), degree assortativity
  (moment sums give exactly 0), and the combined diagnostics row;
- trade fixture B (complete bipartite {0,1}→{2,3}): HITS converges
  to exact max-normalized scores — sources are pure hubs (10^9),
  sinks pure authorities;
- co-purchase fixture C (a 66-clique of parts 0..65 built from
  2-part orders, plus a peeled 6-clique 100..105): the 65-core is
  exactly the big clique, every clique member has cc = 1.0, and LPA
  converges to one community per clique with the min part id as
  label.

Trade edges derive from lineitem⋈orders⋈customer⋈supplier with
s_nationkey ≠ c_nationkey and a top-3-partners cap (out-degree ≤ 2
planted, so the cap never cuts); each trade order carries ONE part so
fixtures A/B add no co-purchase edges.
"""

import os

import pytest

from dbt_project_spark.catalog import QUERIES, load_all

load_all()


def _write_trade_dir(spark, base: str, edges: list[tuple[int, int]]) -> str:
    sup, cus, orde, li = [], [], [], []
    for i, (src, dst) in enumerate(edges):
        k = i + 1
        sup.append((k, f"s{k}", src, 0.0))
        cus.append((k, f"c{k}", dst, 0.0, "BUILDING"))
        orde.append((k, k, "O", 100.0, "1996-01-01 00:00:00", "1-URGENT"))
        li.append(
            (k, 1000 + k, k, 1, 1.0, 100.0, 0.0, 0.0, "N", "O",
             "1996-01-02 00:00:00")
        )
    spark.createDataFrame(
        sup, "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
    ).write.parquet(os.path.join(base, "supplier.parquet"))
    spark.createDataFrame(
        cus,
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.parquet(os.path.join(base, "customer.parquet"))
    spark.createDataFrame(
        orde,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "cast(o_orderdate as timestamp) o_orderdate", "o_orderpriority",
    ).write.parquet(os.path.join(base, "orders.parquet"))
    spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "cast(l_shipdate as timestamp) l_shipdate",
    ).write.parquet(os.path.join(base, "lineitem.parquet"))
    return base


@pytest.fixture(scope="module")
def trade_a(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("graph_a") / "sf")
    return _write_trade_dir(spark, d, [(0, 1), (1, 0), (0, 2), (2, 3)])


@pytest.fixture(scope="module")
def trade_b(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("graph_b") / "sf")
    return _write_trade_dir(spark, d, [(0, 2), (0, 3), (1, 2), (1, 3)])


@pytest.fixture(scope="module")
def copurchase_c(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("graph_c") / "sf")
    li = []
    ok = 0
    # 66-clique: one 2-part order per unordered pair (u, v)
    for u in range(66):
        for v in range(u + 1, 66):
            ok += 1
            for ln, part in enumerate((u, v), start=1):
                li.append(
                    (ok, part, 1, ln, 1.0, 100.0, 0.0, 0.0, "N", "O",
                     "1996-01-02 00:00:00")
                )
    # peeled periphery: a single 6-part basket (degree 5 < K=65)
    for ln, part in enumerate(range(100, 106), start=1):
        li.append(
            (9000, part, 1, ln, 1.0, 100.0, 0.0, 0.0, "N", "O",
             "1996-01-02 00:00:00")
        )
    spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "cast(l_shipdate as timestamp) l_shipdate",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    return d


def test_bfs_hops_trade_planted(spark, trade_a):
    got = {
        r["nationkey"]: r["hops"]
        for r in QUERIES["bfs_hops_trade"](spark, trade_a).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_trade_reciprocity_planted(spark, trade_a):
    rows = QUERIES["trade_reciprocity"](spark, trade_a).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_edges"] == 4
    assert r["n_reciprocated"] == 2  # the 0↔1 pair, in both directions
    assert r["reciprocity_micro"] == 500_000


def test_degree_assortativity_planted(spark, trade_a):
    # total degrees 3,2,2,1 → edge moment sums make the numerator
    # m·Σxy − Σx·Σy exactly zero
    rows = QUERIES["degree_assortativity"](spark, trade_a).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_edges"] == 4
    assert r["mean_src_deg_micro"] == 2_500_000
    assert r["mean_dst_deg_micro"] == 2_000_000
    assert r["assortativity"] == 0.0


def test_trade_graph_diagnostics_planted(spark, trade_a):
    rows = QUERIES["trade_graph_diagnostics"](spark, trade_a).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 4
    assert r["reciprocity_micro"] == 500_000
    assert r["assort_num"] == "0"
    # (m·Σxx − Σx²)·(m·Σyy − Σy²) = (104−100)·(72−64) = 32
    assert r["assort_den_sq"] == "32"


def test_hits_trade_planted(spark, trade_b):
    # complete bipartite {0,1}→{2,3}: sources are pure hubs, sinks
    # pure authorities; symmetric ties make max-normalization exact
    got = {
        r["nationkey"]: (r["hub_scaled"], r["auth_scaled"], r["hub"], r["auth"])
        for r in QUERIES["hits_trade"](spark, trade_b).collect()
    }
    s = 1_000_000_000
    assert got == {
        0: (s, 0, 1.0, 0.0),
        1: (s, 0, 1.0, 0.0),
        2: (0, s, 0.0, 1.0),
        3: (0, s, 0.0, 1.0),
    }


def test_kcore_parts_planted(spark, copurchase_c):
    # the 65-core is exactly the 66-clique; the 6-clique periphery
    # (degree 5) peels in round one
    rows = QUERIES["kcore_parts"](spark, copurchase_c).collect()
    assert sorted(r["partkey"] for r in rows) == list(range(66))
    assert all(r["core_deg"] == 65 for r in rows)


def test_clustering_coefficient_planted(spark, copurchase_c):
    # every clique member closes all of its C(65,2)=2080 wedges →
    # cc = 1.0 exactly; top-20 ties break to the lowest part ids
    rows = QUERIES["clustering_coefficient"](spark, copurchase_c).collect()
    assert sorted(r["partkey"] for r in rows) == list(range(20))
    for r in rows:
        assert r["degree"] == 65
        assert r["triangles"] == 2080
        assert r["cc_micro"] == 1_000_000


def test_lpa_communities_planted(spark, copurchase_c):
    got = {
        r["community"]: (r["n_members"], r["min_part"], r["max_part"])
        for r in QUERIES["lpa_communities"](spark, copurchase_c).collect()
    }
    assert got == {0: (66, 0, 65), 100: (6, 100, 105)}
