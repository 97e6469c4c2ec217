"""Every declared query must match its DuckDB oracle (the driver's t2 gate)."""

from __future__ import annotations

import pytest

from egal_yet_another_earthquake_project_spark import workloads

from tests.conftest import TESTDATA_ORACLE
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(workloads.QUERIES))
def test_query_matches_oracle(spark, name):
    if name not in workloads.ORACLES:
        pytest.skip(f"{name} has no SQL oracle (rows-only check)")
    df = workloads.QUERIES[name](spark, TESTDATA_ORACLE)
    problems = compare(df, workloads.ORACLES[name], TESTDATA_ORACLE)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
