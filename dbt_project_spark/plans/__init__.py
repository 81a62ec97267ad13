from dbt_project_spark.plans.project import Project, SchemaTestError

__all__ = ["Project", "SchemaTestError"]
