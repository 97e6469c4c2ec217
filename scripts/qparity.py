#!/usr/bin/env python
"""Single-query oracle parity check for optimization work: the same
engine-vs-DuckDB compare as parity.py, over just the queries named on
the command line — proves a restructured query still matches its oracle
before the full-registry artifact is regenerated.

Usage: python scripts/qparity.py q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from egal_yet_another_earthquake_project_spark import workloads
    from egal_yet_another_earthquake_project_spark.session import get_spark
    from tests.oracle_harness import compare

    spark = get_spark("egal-qparity", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name in sys.argv[1:]:
        fn = workloads.QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED")
            bad += 1
            continue
        try:
            df = fn(spark, SF_DIR)
            if name in workloads.ORACLES:
                problems = compare(df, workloads.ORACLES[name], SF_DIR)
                if problems:
                    bad += 1
                    print(f"{name}: FAIL {problems[:3]}")
                else:
                    print(f"{name}: ok")
            else:
                n = df.count()
                print(f"{name}: rows-only, {n} rows")
        except Exception as exc:
            bad += 1
            print(f"{name}: ERROR {exc}")
        spark.catalog.clearCache()
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
