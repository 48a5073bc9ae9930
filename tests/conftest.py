from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from starbelly_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small parallelism for fast test startup; correctness must not
    # depend on it (determinism tests re-run at other levels).
    s = get_spark("starbelly-tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
