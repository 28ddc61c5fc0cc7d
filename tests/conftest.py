"""Shared Spark fixture for the test suite.

One session per pytest run (JVM startup is ~6s); shuffle partitions
kept tiny because test data is rows-not-gigabytes and 200 empty
tasks per shuffle would dominate wall time.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from maston_spark.session import build_session

    s = build_session("maston-spark-tests")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def sf_dir() -> str:
    return SF_DIR
