#!/usr/bin/env python
"""Capture `.explain("formatted")` output for named declared queries
into plans/<round>/<query>_<suffix>.txt — the before/after plan evidence
files the optimization rounds commit alongside their claims.

Usage: python scripts/plancap.py SUFFIX q1 q2 ...
       [env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
        PLANCAP_DIR (default plans/r13)]

Plan capture only — no action is executed (AdaptiveSparkPlan rows show
isFinalPlan=false by design; the shape evidence is the operator tree).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from egal_yet_another_earthquake_project_spark import workloads
from egal_yet_another_earthquake_project_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("PLANCAP_DIR", "plans/r13")
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("egal-plancap", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    for name in names:
        fn = workloads.QUERIES.get(name)
        if fn is None:
            print(f"{name}: not in QUERIES", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            txt = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            print(f"{name}: ERROR {exc}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
