from __future__ import annotations

import os

import pytest

TESTDATA_SMOKE = "/root/testdata/sf0.001"
TESTDATA_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from egal_yet_another_earthquake_project_spark.session import get_spark

    s = get_spark("egal-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
