"""Assertable facts about physical plans.

"Would this survive a 100× scale-up?" is a property of the *plan*, not the
result: filters must reach the parquet scan, small dimensions must
broadcast, top-k must not globally sort, scans must prune columns. This
module turns those properties into strings/predicates the test suite (and
bench tuning) can assert on, so a regression that silently de-optimizes a
plan fails CI instead of an SLO.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters entries across the plan's scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings per scan — for column-pruning assertions."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    """TakeOrderedAndProject = per-partition top-k heaps, no global sort."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def join_key_nodes(df: DataFrame) -> list[tuple[str, set[str]]]:
    """``[(join_node_name, {join key column names})]`` for every equi-join
    in the formatted plan — lets tests assert WHICH join got WHICH physical
    strategy (e.g. "the c_custkey join must not be broadcast")."""
    plan = formatted_plan(df)
    out: list[tuple[str, set[str]]] = []
    for block in re.split(r"\n\(\d+\) ", plan):
        name = block.split("\n", 1)[0].split(" ")[0]
        if "Join" not in name:
            continue
        keys: set[str] = set()
        for m in re.finditer(r"(?:Left|Right) keys \[\d+\]: \[(.*?)\]", block):
            for k in m.group(1).split(","):
                keys.add(k.strip().split("#")[0])
        out.append((name, keys))
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower is better; broadcast
    exchanges are excluded).

    Walks the formatted plan's per-node detail blocks and counts
    Exchange nodes whose Arguments are hash- or range-partitioned.
    Two traps this dodges: formatted mode puts the node name and its
    arguments on separate lines (a same-line "Exchange hashpartitioning"
    pattern matches NOTHING, so every assertion on it passes vacuously —
    found when a plan with a visible Exchange counted 0), and a global
    aggregate's mandatory SinglePartition hop carries one row per task
    and must not count as a shuffle."""
    plan = formatted_plan(df)
    count = 0
    for block in re.split(r"\n(?=\(\d+\) )", plan):
        header = block.split("\n", 1)[0]
        if re.match(r"\(\d+\) Exchange$", header) and (
            "hashpartitioning" in block or "rangepartitioning" in block
        ):
            count += 1
    return count


def codegen_stage_count(df: DataFrame) -> int:
    """How many whole-stage-codegen subtrees the plan compiles to (the
    formatted AQE plan hides codegen ids pre-execution, so ask the codegen
    explain mode directly)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    buf = io.StringIO()
    try:
        # An unexecuted AdaptiveSparkPlan reports 0 subtrees; plan without
        # AQE to see the codegen structure.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        with redirect_stdout(buf):
            df.explain("codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
    return int(m.group(1)) if m else 0


def plan_audit(df: DataFrame) -> dict:
    """One-call plan-property report — the assertions the test suite
    makes, as a user-facing dict (surfaced by the CLI ``explain``
    command): shuffle count, join strategies with their keys, pushed
    filters, scan schemas, top-k/codegen flags, and nested-loop
    presence (the 100 TB red flag unless the query is a declared
    baseline)."""
    plan = formatted_plan(df)
    return {
        "exchanges": exchange_count(df),
        "joins": [
            {"node": n, "keys": sorted(k)} for n, k in join_key_nodes(df)
        ],
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "take_ordered_topk": "TakeOrderedAndProject" in plan,
        "whole_stage_codegen_stages": codegen_stage_count(df),
        "nested_loop_join": "BroadcastNestedLoopJoin" in plan
        or "CartesianProduct" in plan,
    }
