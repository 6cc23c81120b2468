import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

TESTDATA = os.environ["SPARK_GRAFT_SF_DIR"]


@pytest.fixture(scope="session")
def spark():
    from pimbloomfilters_spark.session import get_spark

    s = get_spark("pbf-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA
