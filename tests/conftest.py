import pytest

from dbt_project_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dbt-project-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def spark_session_holder():
    """Session fixture usable inside @given-decorated hypothesis tests
    (hypothesis forbids function-scoped fixtures there)."""
    return get_spark(app_name="dbt-project-spark-tests", shuffle_partitions=8)
