"""Graph-analytics family: triangle counting over the part co-purchase
graph and fixed-point PageRank over a nation trade graph, both derived
from the TPC-H-ish tables. Complements `dedup_clusters` (connected
components in queries_corpus.py) — together these are the three graph
primitives a relational engine is usually asked for before anyone
reaches for a graph system.

Determinism: graphs are built with integer keys and fixed-point
weights; PageRank runs in scaled-integer arithmetic (BIGINT
micro-units, floor division) so iteration results are bit-identical
across engines — summing doubles would be order-dependent and could
never hash-gate.

Scale shapes:
- triangle_count uses the degree-orientation trick: each undirected
  edge is directed from its (degree, id)-smaller endpoint, bounding
  per-node wedge fan-out by sqrt(m) on any graph — the difference
  between O(Σdeg²) and O(m^1.5) at 100 TB. All stages are equi-joins.
- pagerank: ranks are nodes-sized, edges are the big side; every
  iteration is one broadcast-ranks join + one dst aggregation. The
  unrolled-loop pattern is exactly how you'd run it on a cluster until
  graph size forces Pregel-style message batching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_project_spark.catalog import register
from dbt_project_spark.sources import load_table

# PageRank parameters: scaled-integer rank units, 85/100 damping,
# fixed iteration count (unrolled in both engines).
PR_SCALE = 1_000_000_000_000
PR_ITERS = 5
# Top partner nations kept per source nation (the full trade graph is
# complete at 25 nations — thresholding makes the structure visible).
PR_TOP_PARTNERS = 3

_W100 = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
# Per-order basket cap for the co-purchase edge build: pair generation
# inside an order is O(basket²), so a pathological basket (one order
# holding thousands of items — co-occurrence graphs outside TPC-H do
# this) would go quadratic. Keep the top TC_MAX_BASKET parts per order
# by total quantity (fixed-point, partkey tiebreak — deterministic in
# both engines). TPC-H orders have ≤7 lineitems, so 8 changes nothing
# at test scale while bounding any input.
TC_MAX_BASKET = 8
_Q100 = "CAST(round(l_quantity * 100, 0) AS BIGINT)"


def copurchase_edges(li: DataFrame, max_basket: int = TC_MAX_BASKET) -> DataFrame:
    """Undirected co-purchase edges (u, v), u < v: parts linked when
    they appear in the same order, each order's basket capped to its
    top ``max_basket`` parts by summed quantity. The basket ranking
    window runs over the same l_orderkey partitioning the self-join
    shuffles on, so the cap adds a sort but no extra exchange."""
    per_part = li.groupBy("l_orderkey", "l_partkey").agg(
        F.sum(F.expr(_Q100)).alias("q100")
    )
    wq = Window.partitionBy("l_orderkey").orderBy(
        F.desc("q100"), F.asc("l_partkey")
    )
    basket = (
        per_part.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= max_basket)
        .select("l_orderkey", "l_partkey")
    )
    a = basket.alias("a")
    b = basket.alias("b")
    return (
        a.join(
            b,
            on=(F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )


@register(
    "triangle_count",
    oracle=f"""
    WITH bp AS MATERIALIZED (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY SUM({_Q100}) DESC, l_partkey) AS rk
        FROM lineitem GROUP BY l_orderkey, l_partkey)
      WHERE rk <= {TC_MAX_BASKET}),
    e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
               FROM bp a JOIN bp b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
    deg AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM (
              SELECT u AS node FROM e UNION ALL SELECT v FROM e)
            GROUP BY node),
    o AS MATERIALIZED (SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
                 CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst
          FROM e JOIN deg du ON du.node = e.u
                 JOIN deg dv ON dv.node = e.v),
    wedge AS (SELECT e1.dst AS a, e2.dst AS b
              FROM o e1 JOIN o e2
                ON e1.src = e2.src AND e1.dst < e2.dst),
    closing AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM o),
    tri AS (SELECT COUNT(*) AS n_triangles
            FROM wedge w
            WHERE EXISTS (SELECT 1 FROM closing c
                          WHERE c.a = w.a AND c.b = w.b))
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM e) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM tri
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the part co-purchase graph (parts linked
    when they appear in the same order), using degree orientation:
    direct each edge toward its higher-(degree, id) endpoint, fan out
    wedges only along out-edges, close them against the oriented edge
    set. Oriented out-degree is bounded by O(sqrt(m)), so the wedge
    stage can't blow up on a hub part the way naive Σdeg² does.

    The edge build caps each order's basket at TC_MAX_BASKET parts
    (see ``copurchase_edges``) so a pathological basket can't make
    per-order pair generation quadratic — mirrored in the oracle.
    """
    from dbt_project_spark.operators.graph import triangle_count as tc

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    return tc(copurchase_edges(li))


# Shared CTE prefix: the weighted nation trade graph, thresholded to
# each source's top partners — used verbatim by the PageRank and BFS
# oracles so both verify against the identical edge list.
_TRADE_GRAPH_SQL = f"""
    WITH w AS MATERIALIZED (SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                      SUM({_W100}) AS w100
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
               WHERE s.s_nationkey <> c.c_nationkey
               GROUP BY 1, 2),
    edges AS MATERIALIZED (SELECT src, dst FROM (
                SELECT src, dst,
                       ROW_NUMBER() OVER (PARTITION BY src
                                          ORDER BY w100 DESC, dst) AS rk
                FROM w)
              WHERE rk <= {PR_TOP_PARTNERS}),
    nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges))"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed nation trade edges (src, dst): supplier nation ships
    to customer nation, each source keeping its top
    ``PR_TOP_PARTNERS`` partners by traded volume. The Spark twin of
    ``_TRADE_GRAPH_SQL``."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    w = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(
            F.sum(F.expr(_W100)).alias("w100"),
        )
    )
    wk = Window.partitionBy("src").orderBy(F.desc("w100"), F.asc("dst"))
    return (
        w.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= PR_TOP_PARTNERS)
        .select("src", "dst")
    )


def _pr_oracle() -> str:
    """Unrolled fixed-point PageRank CTE chain (see pagerank_trade)."""
    head = _TRADE_GRAPH_SQL + f""",
    n AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST({PR_SCALE} // (SELECT n FROM n) AS BIGINT) AS r
           FROM nodes)
    """
    iters = []
    for i in range(1, PR_ITERS + 1):
        prev = f"r{i - 1}"
        iters.append(f"""
    c{i} AS (SELECT e.dst AS node, SUM(p.r // od.od) AS contrib
             FROM edges e
             JOIN {prev} p ON p.node = e.src
             JOIN outdeg od ON od.src = e.src
             GROUP BY e.dst),
    r{i} AS (SELECT nodes.node,
                    CAST(({PR_SCALE} // (SELECT n FROM n)) * 15 // 100
                         + COALESCE(c{i}.contrib, 0) * 85 // 100
                         AS BIGINT) AS r
             FROM nodes LEFT JOIN c{i} ON c{i}.node = nodes.node)""")
    return (
        head
        + ","
        + ",".join(iters)
        + f"""
    SELECT node AS nationkey, r AS rank_scaled,
           r / {PR_SCALE}.0 AS rank
    FROM r{PR_ITERS}
    """
    )


@register("pagerank_trade", oracle=_pr_oracle())
def pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the nation trade graph (supplier
    nation → customer nation, each source keeping its top
    ``PR_TOP_PARTNERS`` partners by traded volume). ``PR_ITERS``
    unrolled iterations in BIGINT micro-units with floor division —
    bit-identical across engines, unlike float PageRank whose sums are
    addition-order-dependent.

    Each iteration: broadcast the nodes-sized rank table onto the
    edge list, aggregate contributions by dst — at 100 TB the edges
    never move, only rank deltas do. (Past ~10^9 nodes you'd switch to
    checkpointed Pregel rounds; the per-iteration dataflow is the
    same join+agg as here.)
    """
    from dbt_project_spark.operators.graph import pagerank_fixedpoint

    ranks = pagerank_fixedpoint(
        _trade_edges(spark, sf_dir), iters=PR_ITERS, scale=PR_SCALE, damping_pct=85
    )
    return ranks.select(
        F.col("node").alias("nationkey"),
        F.col("r").alias("rank_scaled"),
        (F.col("r") / F.lit(float(PR_SCALE))).alias("rank"),
    )


BFS_ITERS = 8  # > trade-graph diameter; unrolled in both engines


def _bfs_oracle() -> str:
    """Unrolled BFS CTE chain over the shared trade graph."""
    parts = [
        _TRADE_GRAPH_SQL,
        """,
    src0 AS (SELECT MIN(node) AS s FROM nodes),
    d0 AS (SELECT (SELECT s FROM src0) AS node, 0 AS hops)""",
    ]
    for i in range(1, BFS_ITERS + 1):
        parts.append(f""",
    d{i} AS (SELECT node, MIN(hops) AS hops FROM (
        SELECT node, hops FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, d.hops + 1 AS hops
        FROM d{i - 1} d JOIN edges e ON e.src = d.node) GROUP BY node)""")
    parts.append(f"""
    SELECT node AS nationkey, CAST(hops AS BIGINT) AS hops FROM d{BFS_ITERS}
    """)
    return "".join(parts)


@register("bfs_hops_trade", oracle=_bfs_oracle())
def bfs_hops_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest hop count from the minimum nation to every reachable
    nation over the trade graph — unrolled BFS (``BFS_ITERS`` fixed
    rounds, > graph diameter), the third graph primitive next to
    PageRank and connected components.

    Scale shape (see operators/graph.py:bfs_hops): edges never move;
    each round joins the nodes-sized distance table onto the edge
    list and min-aggregates with map-side combine. The distance table
    is broadcast only under the node-count threshold — past it the
    rounds become plain shuffle equi-joins, same as PageRank.
    """
    from dbt_project_spark.operators.graph import bfs_hops

    dist = bfs_hops(_trade_edges(spark, sf_dir), iters=BFS_ITERS)
    return dist.select(
        F.col("node").alias("nationkey"), F.col("hops").cast("bigint").alias("hops")
    )
