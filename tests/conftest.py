import pytest

from sri2db_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sri2db_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
