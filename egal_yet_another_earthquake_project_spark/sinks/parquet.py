"""Batch Parquet / object-store sinks (SURVEY S2 batch form, S10).

The reference archives raw API responses to S3 objects via NiFi
(egal-project-nifi.xml:2797-2837). Engine form: partitioned Parquet writes
— an s3a:// path gives the same durability with columnar pruning on read.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


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


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_cols: list[str] | None = None,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-files compaction: read a fragmented dataset, rewrite it as
    ``ceil(rows / target_rows_per_file)`` balanced files. Returns the
    output file count.

    Micro-batch sinks (streaming/bronze.py) leave one file per trigger
    per partition; at large scale the resulting millions of small files
    dominate read cost — per-file open overhead, driver scheduling
    pressure, object-store LIST storms — long before data volume does.
    Without ``partition_cols`` the repartition is round-robin (evenly
    sized files); with them it hashes on the partition columns so each
    hive partition's rows land in few tasks instead of every task writing
    a sliver into every partition directory. The extra count() pass is a
    maintenance-job cost, amortized by every later scan.
    """
    df = spark.read.parquet(src_path)
    rows = df.count()
    n_files = max(1, math.ceil(rows / target_rows_per_file))
    if partition_cols:
        compacted = df.repartition(n_files, *partition_cols)
    else:
        compacted = df.repartition(n_files)
    write_partitioned(compacted, dst_path, partition_cols, mode="overwrite")
    out = spark.read.parquet(dst_path)
    return len(out.inputFiles())
