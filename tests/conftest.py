import pytest


@pytest.fixture(scope="session")
def spark():
    from pikes_spark.session import get_spark
    s = get_spark(app="pikes_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
