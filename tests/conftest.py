from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_s3_etl_spark.session import build_session  # noqa: E402

# sf0.001 keeps the pytest loop fast; the pre-commit ritual re-runs the
# oracle suite at sf0.01 (the driver's correctness SF) via
# SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01.
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="kafka_s3_etl_spark_tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR
