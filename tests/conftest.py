import pytest

from lexis_minhash_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lexis-minhash-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
