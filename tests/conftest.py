from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Local-test posture (mirrors bench.py): split small single-file parquet
# so scans parallelize; the session default stays cluster-safe (128m).
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")


@pytest.fixture(scope="session")
def spark():
    from flink_tpcds_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    from flink_tpcds_spark.oracle import duckdb_connection

    return duckdb_connection(SF_DIR)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
