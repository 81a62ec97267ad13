"""dbt_project_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference web-traffic / warehouse
pipeline (Maitri-Shekhda/Dbt-project) Spark-first: declarative
DataFrame/SQL plans optimized by Catalyst, Structured Streaming for the
streaming topology, and a dbt-style model DAG for warehouse pipelines.
"""

from dbt_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
