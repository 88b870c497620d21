import pytest

from smalltsdb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="smalltsdb-tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture()
def tsdb_dir(tmp_path):
    return str(tmp_path / "tsdb")
