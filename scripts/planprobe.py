#!/usr/bin/env python
"""Plan-BUILD cost probe: times ONLY the Python-side DataFrame
construction (query function call — py4j traffic, expression-tree
assembly) for each named query, no action executed. Separates driver
plan-build cost from executor compute so optimization targets the right
side (guide §1: measure first; §7.3: planning time as a bottleneck).

Usage: python scripts/planprobe.py [q1 q2 ...]   (default: bench HEADLINE)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from egal_yet_another_earthquake_project_spark import workloads
from egal_yet_another_earthquake_project_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEADLINE
    spark = get_spark("egal-planprobe", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # Touch every query once so one-time costs (module imports, first
    # py4j calls, FS metadata) don't land on the first measured row.
    for name in names:
        fn = workloads.QUERIES.get(name)
        if fn is None:
            continue
        try:
            fn(spark, sf_dir)
        except Exception:
            pass
    out: dict[str, float] = {}
    for name in names:
        fn = workloads.QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir)
        except Exception as exc:
            print(f"{name}: ERROR {exc}", file=sys.stderr)
            continue
        out[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps(dict(sorted(out.items(), key=lambda kv: -kv[1])), indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
