"""Batch Parquet / object-store sinks (SURVEY S2 batch form, S10).

The reference archives raw API responses to S3 objects via NiFi
(egal-project-nifi.xml:2797-2837). Engine form: partitioned Parquet writes
— an s3a:// path gives the same durability with columnar pruning on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "append",
) -> None:
    """Write a gold/silver table, partitioned for downstream pruning
    (SURVEY §4.2: bronze by ingest_date, silver by event_date)."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
