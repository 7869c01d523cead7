import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from geosparql_etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "gsel-tests",
        master=os.environ.get("GSEL_TEST_MASTER", "local[4]"),
        shuffle_partitions=int(os.environ.get("GSEL_TEST_SHUFFLE", "4")),
        extra_conf={
            "spark.sql.adaptive.enabled": os.environ.get("GSEL_TEST_AQE", "true"),
            "spark.sql.codegen.wholeStage": os.environ.get("GSEL_TEST_CODEGEN", "true"),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
