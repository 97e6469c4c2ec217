#!/usr/bin/env python
"""Full-registry oracle parity artifact generator.

Runs EVERY declared query in ``workloads.QUERIES`` (not just the driver's
50-query per-round sample) against its DuckDB oracle at sf0.01 using the
same compare as ``tests/oracle_harness.py``, and writes a committed
``PARITY_r{N}.json`` with driver-shaped per-query verdicts::

    {"q": {"rows_match": bool, "schema_match": bool, "hash_match": bool,
           "spark_rows": int, "oracle_rows": int, "err": str|null,
           "oracle": bool}}

Queries without an SQL oracle (genuinely non-SQL-expressible ops) get a
rows-only verdict (``oracle: false``; ``hash_match``/``schema_match``
null). Usage::

    python parity.py [round_number]      # default output PARITY_rNN.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("ROUND", "5"))
    out_path = f"PARITY_r{rnd:02d}.json"

    from egal_yet_another_earthquake_project_spark import workloads
    from egal_yet_another_earthquake_project_spark.session import get_spark
    from tests.oracle_harness import compare

    spark = get_spark("egal-parity", shuffle_partitions=16)
    results: dict[str, dict] = {}
    t0 = time.time()
    for name in sorted(workloads.QUERIES):
        fn = workloads.QUERIES[name]
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "oracle": name in workloads.ORACLES,
        }
        try:
            df = fn(spark, SF_DIR)
            if name in workloads.ORACLES:
                problems = compare(df, workloads.ORACLES[name], SF_DIR)
                rec["schema_match"] = not any("column sets differ" in p for p in problems)
                rec["rows_match"] = not any("row counts differ" in p for p in problems)
                rec["hash_match"] = not problems
                # compare() collected counts internally; recompute cheaply
                rec["spark_rows"] = df.count()
                from tests.oracle_harness import run_oracle

                rec["oracle_rows"] = len(run_oracle(workloads.ORACLES[name], SF_DIR)[1])
                if problems:
                    rec["err"] = "; ".join(problems)[:500]
            else:
                n = df.count()
                rec["spark_rows"] = n
                rec["rows_match"] = n >= 0
        except Exception as exc:  # noqa: BLE001 - artifact must record the failure
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
            rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = False
        results[name] = rec
        flag = "ok" if not rec["err"] else "FAIL"
        print(f"  {name}: {flag}", flush=True)

    n_total = len(results)
    # Rounding-margin audits (VERDICT r11 #1b): every rounded-rank query
    # must keep all raw rank keys / emitted floats > MIN_MARGIN from
    # their rounding boundary on THIS dataset — fragility is detected at
    # parity time, never suffered as an unexplainable driver hash flip.
    from egal_yet_another_earthquake_project_spark.audits import (
        MIN_MARGIN,
        run_margin_audits,
    )

    margins = run_margin_audits(spark, SF_DIR)
    n_margin_fail = sum(1 for m in margins.values() if not m["pass"])
    for name, m in sorted(margins.items()):
        flag = "ok" if m["pass"] else "MARGIN-FAIL"
        print(
            f"  margin {name}: {flag} ({m['weakest']} = {m['min_margin']:.3e})",
            flush=True,
        )

    n_green = sum(1 for r in results.values() if not r["err"])
    summary = {
        "round": rnd,
        "sf_dir": SF_DIR,
        "total_queries": n_total,
        "green": n_green,
        "with_sql_oracle": sum(1 for r in results.values() if r["oracle"]),
        "margin_min": MIN_MARGIN,
        "margin_fails": n_margin_fail,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(
            {"summary": summary, "queries": results, "margin_audits": margins},
            f, indent=1, sort_keys=True,
        )
    print(json.dumps(summary))
    spark.stop()
    return 0 if n_green == n_total and n_margin_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
