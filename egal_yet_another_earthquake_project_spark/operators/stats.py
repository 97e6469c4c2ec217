"""Descriptive statistics (SURVEY A3, A7, P8).

The reference sniffs numeric columns by ``take(1)`` + ``isinstance``
(/root/reference/sparktoELKstream.py:181-188) and runs
``mllib.Statistics.colStats`` (:194-227) — count, mean, **sample** variance,
stddev (√variance, :217), max, min, and sum reconstructed as mean·count
(:214). Here: numeric columns come from the schema (no job), and all seven
statistics for all columns compute in ONE aggregate job (the reference runs
a job per action; at 100 TB one pass vs. seven matters).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def numeric_columns(df: DataFrame) -> list[str]:
    """Schema-driven replacement for the reference's sample-a-row sniff (P8)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, T.NumericType)]


#: statistic name → aggregate builder; variance is the unbiased (sample)
#: variance to match mllib colStats.
_STATS = {
    "count": lambda c: F.count(c).cast("double"),
    "mean": F.avg,
    "variance": F.var_samp,
    "stddev": F.stddev_samp,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
}


def describe_numeric(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Long-form stats table: one row per (column, statistic).

    Single wide aggregate → unpivot via ``stack``; exactly one shuffle-free
    map-side-combinable pass over the data regardless of column count.
    Output: ``column: string, statistic: string, value: double``.
    """
    cols = list(cols) if cols is not None else numeric_columns(df)
    aggs = [
        fn(c).cast("double").alias(f"{c}__{stat}")
        for c in cols
        for stat, fn in _STATS.items()
    ]
    wide = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', '{stat}', `{c}__{stat}`" for c in cols for stat in _STATS
    )
    n = len(cols) * len(_STATS)
    return wide.selectExpr(
        f"stack({n}, {pairs}) as (column, statistic, value)"
    )


def global_extrema(df: DataFrame, col: str) -> DataFrame:
    """Global max/min in one aggregate (A7) — the reference runs two full
    ``reduce`` jobs (/root/reference/sparktoELKstream.py:319-324)."""
    return df.agg(
        F.max(col).cast("double").alias(f"max_{col}"),
        F.min(col).cast("double").alias(f"min_{col}"),
    )
