import pytest

from dbt_project_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dbt-project-spark-tests", shuffle_partitions=8)
    yield s
