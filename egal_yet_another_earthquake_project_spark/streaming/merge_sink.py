"""Streaming CDC materialization: a change stream continuously merged
into a partitioned parquet table.

``foreachBatch`` turns each micro-batch into one call of the batch
partition-level MERGE (``sinks/merge.py``) — the standard
stream-to-table pattern when no transactional format is available:
per trigger the work is O(touched partitions), untouched partition
files never move, and the merge itself is last-writer-wins on the key,
so checkpoint-replayed batches are idempotent (the replayed batch
rewrites the same partitions to the same content).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from egal_yet_another_earthquake_project_spark.sinks.merge import (
    merge_into_partitioned,
)


def stream_merge_into(
    changes: DataFrame,
    table_dir: str,
    keys: Sequence[str],
    partition_col: str,
    order_col: str | None = None,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Start a streaming query that merges each micro-batch of
    ``changes`` into the table at ``table_dir``. The target must exist
    (seed it with one batch write); ``order_col`` collapses intra-batch
    duplicates newest-first, making replay idempotent."""

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_into_partitioned(
            batch.sparkSession, table_dir, batch, keys, partition_col, order_col
        )

    writer = changes.writeStream.foreachBatch(_merge).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
