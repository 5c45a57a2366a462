import pytest

from gobblin_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gobblin-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
