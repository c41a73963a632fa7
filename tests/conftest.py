import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anomaly_detector_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="adspark-tests", master="local[4]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def count_exchanges(df) -> int:
    """Number of Exchange (shuffle) operators in the EXECUTED plan — plan-
    shape assertion helper.  Lives in the test tree (it pokes `_jdf`
    py4j internals, which stay out of library paths)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
