#!/usr/bin/env python
"""One-epoch backfill for the r10 bench-honesty finding.

r10's judge plan-audit found 22 of 119 bench rows whose timed
``count()`` plan drops Join/Window/Generate subtrees the declared query
executes (Catalyst satisfies a count from the smallest cardinality-
preserving subtree). bench.py r11+ times a full materialization
instead; this probe runs BOTH forms for every affected row in the SAME
host epoch so cross-round comparisons can translate old-form numbers
into new-form numbers instead of mixing regimes.

Output: BENCH_HONESTY_r{N}.json —
  {"epoch_calibration_sec": c,
   "rows": {name: {"count_nodes": {...}, "full_nodes": {...},
                   "count_sec": m, "materialized_sec": m,
                   "ratio": materialized/count}}}
plus a markdown table on stdout for SCALE.md.

Usage: python probe_bench_honesty.py  (sf0.1, local[$SPARK_GRAFT_CPUS])
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench
from egal_yet_another_earthquake_project_spark import workloads
from egal_yet_another_earthquake_project_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "egal-spark-bench-honesty",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.ui.retainedExecutions": "8",
            "spark.appStateStore.asyncTracking.enable": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Find the affected rows: count-form plan drops heavy nodes.
    affected: dict[str, dict] = {}
    for name in bench.HEADLINE:
        fn = workloads.QUERIES.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        full = bench._plan_nodes(df)
        count_form = bench._plan_nodes(df.groupBy().count())
        if any(count_form[k] < full[k] for k in full):
            affected[name] = {"full_nodes": full, "count_nodes": count_form}
    print(f"affected rows: {len(affected)}: {sorted(affected)}", file=sys.stderr)

    # Warmup (compile codegen) then time both forms in one epoch.
    warmup = "/root/testdata/sf0.001"
    for name in affected:
        fn = workloads.QUERIES[name]
        try:
            fn(spark, warmup).count()
            bench._force(fn(spark, warmup))
        except Exception:
            pass
        spark.catalog.clearCache()

    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id)").collect()
    calibration = round(time.perf_counter() - t0, 3)

    def med3(thunk) -> float:
        samples = []
        for _ in range(3):
            t = time.perf_counter()
            thunk()
            samples.append(time.perf_counter() - t)
            bench._release_storage(spark)
        samples.sort()
        return round(samples[1], 3)

    rows = {}
    for name, nodes in sorted(affected.items()):
        fn = workloads.QUERIES[name]
        c = med3(lambda: fn(spark, sf_dir).count())
        m = med3(lambda: bench._force(fn(spark, sf_dir)))
        rows[name] = dict(
            nodes,
            count_sec=c,
            materialized_sec=m,
            ratio=round(m / c, 3) if c else None,
        )
        print(f"{name}: count {c} s -> materialized {m} s", file=sys.stderr)

    here = os.path.dirname(os.path.abspath(__file__))
    rnd = bench._round_number(here)
    payload = {"epoch_calibration_sec": calibration, "rows": rows}
    with open(os.path.join(here, f"BENCH_HONESTY_r{rnd:02d}.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)

    print("| row | count-form s | materialized s | ratio | eliminated nodes |")
    print("|---|---|---|---|---|")
    for name, r in sorted(rows.items()):
        elim = {
            k: f"{r['count_nodes'][k]}/{r['full_nodes'][k]}"
            for k in r["full_nodes"]
            if r["count_nodes"][k] < r["full_nodes"][k]
        }
        print(
            f"| {name} | {r['count_sec']} | {r['materialized_sec']} "
            f"| {r['ratio']} | {elim} |"
        )


if __name__ == "__main__":
    main()
