import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("SPARK_GRAFT_SF_SMOKE", "/root/testdata/sf0.001")
SF_TEST = os.environ.get("SPARK_GRAFT_SF_TEST", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from sketchlib.session import get_spark

    s = get_spark("sketchlib-tests", cores=min(8, os.cpu_count() or 4),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_test():
    return SF_TEST
