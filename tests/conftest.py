import os

import pytest

from time_series_loader_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tsl-tests", master="local[4]", shuffle_partitions=4)
    yield s


SF_DIR = os.environ.get("TSL_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
