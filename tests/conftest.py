import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pynomaly_spark.session import get_spark

    s = get_spark("pynomaly-tests", cpus=int(os.environ.get("TEST_CPUS", "4")))
    yield s
