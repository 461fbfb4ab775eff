import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e_commerce_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Tests run at sf0.001 — a 12g heap ceiling is generous there and
    # keeps the suite's JVM RSS from spiking into ambient memory other
    # processes (bench JVMs, DuckDB) need: the one observed full-suite
    # flake was a DuckDB std::bad_alloc while this JVM could grow to the
    # 24g production default. Explicit env still wins.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
