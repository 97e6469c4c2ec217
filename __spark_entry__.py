"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`egal_yet_another_earthquake_project_spark.workloads`,
which holds the full declared query registry (one entry per implemented
operator from SURVEY.md §2) and the matching DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from egal_yet_another_earthquake_project_spark import workloads


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workloads.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(workloads.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same column
    names/aliases both sides). Keys absent here get rows-only checks."""
    return dict(workloads.ORACLES)
