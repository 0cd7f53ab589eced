from __future__ import annotations

import os

import pytest

from frauddetection_spark.oracle import duckdb_connection
from frauddetection_spark.session import get_spark

# Oracle tests run at sf0.001 locally for speed; the driver runs sf0.01.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="frauddetection-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()
