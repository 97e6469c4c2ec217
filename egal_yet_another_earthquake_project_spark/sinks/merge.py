"""Partition-level MERGE into a parquet table — the physical half of
``operators/upsert.py``.

Without a table format (no Delta/Iceberg jars in this container), the
incremental-materialization pattern for a date-partitioned 100 TB table
is: read ONLY the partitions the batch touches (static partition
pruning), merge last-writer-wins, and write back with DYNAMIC partition
overwrite so every untouched partition's files stay exactly as they
were. Rewriting the whole table per batch would be O(corpus)/day; this
is O(touched partitions) — the same asymptotics a real MERGE INTO has.

The touched-partition set is driver state bounded by the batch's
distinct partition values (dates — hundreds, not rows), same contract
as the probed-cell list in ``llm/ann_index.py``.
"""

from __future__ import annotations

from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.operators.upsert import upsert

_OVERWRITE_MODE = "spark.sql.sources.partitionOverwriteMode"


@contextmanager
def _dynamic_overwrite(spark: SparkSession):
    prev = spark.conf.get(_OVERWRITE_MODE, "static")
    spark.conf.set(_OVERWRITE_MODE, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(_OVERWRITE_MODE, prev)


def merge_into_partitioned(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_col: str,
    order_col: str | None = None,
) -> list:
    """Merge ``updates`` into the parquet table at ``table_dir``
    (partitioned by ``partition_col``), last-writer-wins on ``keys``.

    Only the partitions present in ``updates`` are read, merged, and
    rewritten; every other partition's files are untouched (asserted
    byte-for-byte in tests/test_merge.py). Returns the touched
    partition values.

    Precondition: a row's partition value is stable across versions
    (true for event-date partitioning — a late UPDATE to an event keeps
    its date). A key that MOVES partitions would leave its old version
    in the unread partition, exactly as partition-pruned MERGE behaves
    in any engine.
    """
    touched = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    existing = spark.read.parquet(table_dir).filter(
        F.col(partition_col).isin(touched)
    )
    merged = upsert(existing, updates, keys, order_col)
    # Materialize BEFORE overwriting the source: the write job otherwise
    # reads the very files its commit will delete — deterministic only
    # until a task retries after commit starts. localCheckpoint bounds
    # the footprint at the touched partitions (the whole point of the
    # pruned merge); a cluster deployment with tighter memory uses a
    # reliable checkpoint dir or a staging-path swap instead.
    merged = merged.localCheckpoint(eager=True)
    with _dynamic_overwrite(spark):
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(table_dir)
        )
    return touched
