"""Bucketed tables: co-located joins without a shuffle (SURVEY §4.2).

For repeated large-fact ⋈ large-fact joins (orders ⋈ lineitem at every
query), pre-bucketing both sides on the join key makes every subsequent
join shuffle-free: Spark reads matching buckets pairwise. The write costs
one shuffle once; every downstream join saves one forever — the dominant
term at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans a SortMergeJoin with NO Exchange on either side (assert with
    plans.inspect.exchange_count == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
