from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from twitter_analysis_spark.session import get_spark
    # Modest parallelism for tests; correctness is partition-count
    # independent by construction.
    spark = get_spark(app_name="tests", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8",
                                  "spark.ui.enabled": "false"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
