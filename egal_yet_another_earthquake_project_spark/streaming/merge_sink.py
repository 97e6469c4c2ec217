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


def stream_enrich_with_refreshing_dim(
    stream: DataFrame,
    dim_dir: str,
    key: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    broadcast_dim: bool = True,
) -> StreamingQuery:
    """Enrich a stream against a dimension table that CHANGES while the
    query runs, without restarting the query.

    A plain stream-static join resolves the static side's snapshot ONCE
    at query start — dimension updates (new customers, repriced SKUs,
    refreshed quality scores) are invisible until restart. Here
    ``foreachBatch`` re-reads the dimension per trigger, so every
    micro-batch joins against the CURRENT snapshot; the dim is
    broadcast (dims are small by definition — drop ``broadcast_dim``
    for an unusually large one and let AQE decide). Left join keeps
    unmatched facts flowing with null attributes rather than dropping
    them. Per-trigger cost: one dim read + one broadcast join —
    O(batch), no state.
    """
    from pyspark.sql import functions as F

    def _enrich(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        dim = spark.read.parquet(dim_dir)
        side = F.broadcast(dim) if broadcast_dim else dim
        batch.join(side, key, "left").write.mode("append").parquet(out_dir)

    writer = stream.writeStream.foreachBatch(_enrich).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
