import pytest

from jassv2_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="jassv2-spark-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
