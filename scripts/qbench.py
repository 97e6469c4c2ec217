#!/usr/bin/env python
"""Per-query micro-bench for optimization work: same methodology as
bench.py (sf0.001 warmup, xxhash64-all-columns-bitxor materialization,
median of 3, storage release between runs) over just the queries named
on the command line — so one query's before/after can be measured in
seconds instead of re-running the whole 130-row suite.

Usage: python scripts/qbench.py q1 q2 ...  [env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS as for bench.py]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _bench_bpe200, _bench_curate_e2e, _force, _release_storage
from egal_yet_another_earthquake_project_spark import workloads
from egal_yet_another_earthquake_project_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(
        "egal-spark-qbench",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.ui.retainedExecutions": "8",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    extra = {"curate_e2e": _bench_curate_e2e, "bpe_train_200": _bench_bpe200}

    warmup_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            if name in extra:
                extra[name](spark, warmup_dir)
            else:
                _force(workloads.QUERIES[name](spark, warmup_dir))
        except Exception as exc:
            print(f"warmup {name}: {exc}", file=sys.stderr)
        _release_storage(spark)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, list[float]] = {}
    for name in names:
        samples: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            if name in extra:
                extra[name](spark, sf_dir)
            else:
                _force(workloads.QUERIES[name](spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
            _release_storage(spark)
        timings[name] = sorted(samples)
    print(
        json.dumps(
            {n: {"median": s[1], "runs": s} for n, s in timings.items()},
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
