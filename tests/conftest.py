import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dex_data_ingestor_spark.session import get_session

#: sf0.001 keeps the suite fast; export SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
#: for the driver-scale differential run.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_session(
        app_name="dex-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def plan_formatted(df) -> str:
    """Formatted physical-plan string (shared by plan-assertion tests)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
