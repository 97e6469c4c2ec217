"""Gold-layer analytics (SURVEY P4-P6, A4-A8, U1, L1).

The reference's flagship analytic — "events with magnitude ≥ 4, counted per
fault-line region" — is four separate filter→map RDD pipelines, a 3-way
union, five count() jobs, and two different group-count re-implementations
(/root/reference/sparktoELKstream.py:241-316), each re-executing the full
parse from Parquet. Here each analytic is ONE declarative plan: filter →
groupBy → count, with map-side partial aggregation and partition pruning
for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def threshold_counts_by_group(
    df: DataFrame,
    group_col: str,
    measure_col: str,
    threshold: float,
    groups: Sequence[str] | None = None,
) -> DataFrame:
    """Flagship: rows with ``measure >= threshold`` counted per group.

    Replaces the reference's 4×(filter+map) + union + 5×count + groupBy
    chains (/root/reference/sparktoELKstream.py:241-316) with one job.
    When ``groups`` is given, only those group values are kept (the
    reference enumerates its three regions explicitly; P4).
    Output: ``<group_col>: string, n: long`` (sorted for determinism).
    """
    out = df.filter(F.col(measure_col) >= F.lit(threshold))
    if groups is not None:
        out = out.filter(F.col(group_col).isin(*groups))
    return out.groupBy(group_col).agg(F.count("*").alias("n")).orderBy(group_col)


def counts_by_group(df: DataFrame, group_col: str) -> DataFrame:
    """Plain group-count (A5/A6). The reference has two RDD variants — a
    ``groupBy(...).mapValues(len)`` and a ``groupByKey`` one
    (/root/reference/sparktoELKstream.py:297-316) — both of which shuffle
    every row's full payload; ``groupBy().count()`` ships only partial
    counts."""
    return df.groupBy(group_col).agg(F.count("*").alias("n")).orderBy(group_col)


def filtered_union_counts(
    df: DataFrame,
    group_col: str,
    measure_col: str,
    threshold: float,
    groups: Sequence[str],
) -> DataFrame:
    """Literal-shape parity for the reference's union path (U1, A4): build
    one filtered frame per group value, ``unionByName`` them, count per
    group. Kept for shape-parity tests; Catalyst collapses the union of
    same-source filters back into a single scan, so the plan is as cheap as
    :func:`threshold_counts_by_group`."""
    parts = [
        df.filter((F.col(measure_col) >= F.lit(threshold)) & (F.col(group_col) == g))
        for g in groups
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned.groupBy(group_col).agg(F.count("*").alias("n")).orderBy(group_col)


def distinct_group_keys(
    df: DataFrame, key_col: str, measure_col: str | None = None, threshold: float = 0.0
) -> DataFrame:
    """Distinct key values, optionally over the thresholded subset (A8 —
    the reference's "provinces with M≥4 quakes" intent,
    /root/reference/sparktoELKstream.py:272-282)."""
    out = df
    if measure_col is not None:
        out = out.filter(F.col(measure_col) >= F.lit(threshold))
    return out.select(key_col).distinct().orderBy(key_col)


def top_k(df: DataFrame, order_cols: Sequence[str], k: int, ascending: bool = False) -> DataFrame:
    """Deterministic top-k (L1 done right): total order + limit. Spark
    executes this as TakeOrderedAndProject — per-partition heaps, no full
    sort, no full shuffle."""
    order = [F.col(c).asc() if ascending else F.col(c).desc() for c in order_cols]
    return df.orderBy(*order).limit(k)
