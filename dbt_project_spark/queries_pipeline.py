"""Warehouse-pipeline family: a staging→marts dbt-style DAG whose
final mart is the query result; the oracle is the composed SQL.

DAG (all 'view' materialization — Catalyst inlines the whole chain
into one optimized plan, so the model boundaries cost nothing):

    source(orders)    → stg_orders    (filter open+completed)
    source(lineitem)  → stg_lineitem  (fixed-point revenue col)
    stg_*             → fct_order_revenue (join + per-order agg)
    fct + customer+nation → mart_nation_revenue (enrich + rollup)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_project_spark.catalog import register
from dbt_project_spark.plans import Project
from dbt_project_spark.plans.project import accepted_values, not_null, unique
from dbt_project_spark.sources import load_table


def build_revenue_project(spark: SparkSession, sf_dir: str) -> Project:
    proj = Project(
        spark,
        sources={
            n: load_table(spark, sf_dir, n)
            for n in ("orders", "lineitem", "customer", "nation")
        },
    )

    proj.sql_model(
        "stg_orders",
        """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               date_format(o_orderdate, 'yyyy-MM') AS order_month
        FROM {{ source('orders') }}
        WHERE o_orderstatus IN ('O', 'F')
        """,
    )

    proj.sql_model(
        "stg_lineitem",
        """
        SELECT l_orderkey,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev10000
        FROM {{ source('lineitem') }}
        """,
    )

    proj.sql_model(
        "fct_order_revenue",
        """
        SELECT o.o_orderkey, o.o_custkey, o.order_month,
               SUM(l.rev10000) AS rev10000
        FROM {{ ref('stg_orders') }} o
        JOIN {{ ref('stg_lineitem') }} l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_custkey, o.order_month
        """,
    )

    proj.sql_model(
        "mart_nation_revenue",
        """
        SELECT n.n_name AS nation, f.order_month,
               COUNT(*) AS n_orders,
               SUM(f.rev10000) / CAST(10000 AS DOUBLE) AS revenue
        FROM {{ ref('fct_order_revenue') }} f
        JOIN {{ source('customer') }} c ON c.c_custkey = f.o_custkey
        JOIN {{ source('nation') }} n ON n.n_nationkey = c.c_nationkey
        GROUP BY nation, f.order_month
        """,
    )

    proj.add_test("stg_orders", not_null("o_orderkey"), "not_null_orderkey")
    proj.add_test("stg_orders", unique("o_orderkey"), "unique_orderkey")
    proj.add_test(
        "stg_orders", accepted_values("o_orderstatus", ["O", "F"]), "accepted_status"
    )
    proj.add_test("mart_nation_revenue", not_null("nation"), "not_null_nation")
    return proj


@register(
    "pipeline_nation_revenue",
    oracle="""
    WITH stg_orders AS (
      SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m') AS order_month
      FROM orders WHERE o_orderstatus IN ('O', 'F')),
    stg_lineitem AS (
      SELECT l_orderkey,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev10000
      FROM lineitem),
    fct AS (
      SELECT o.o_orderkey, o.o_custkey, o.order_month, SUM(l.rev10000) AS rev10000
      FROM stg_orders o JOIN stg_lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_custkey, o.order_month)
    SELECT n.n_name AS nation, f.order_month,
           COUNT(*) AS n_orders,
           SUM(f.rev10000) / CAST(10000 AS DOUBLE) AS revenue
    FROM fct f JOIN customer c ON c.c_custkey = f.o_custkey
               JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY nation, f.order_month
    """,
)
def pipeline_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the staging→marts DAG; result is the final mart."""
    proj = build_revenue_project(spark, sf_dir)
    proj.test(["stg_orders"])  # dbt-style gate before shipping the mart
    return proj.ref("mart_nation_revenue")
