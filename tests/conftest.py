import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from sinter_spark.session import get_spark

    s = get_spark(cores=8, app_name="sinter_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    d = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    # the lsh_fixtures oracle builders read the same parquet the query
    # reads — point them at the test sf (driver default is sf0.01)
    os.environ["SINTER_ORACLE_SF_DIR"] = d
    return d
