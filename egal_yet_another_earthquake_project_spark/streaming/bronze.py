"""Bronze layer: raw stream → Parquet archive (SURVEY S1+S2, ST1).

The reference runs four byte-identical scripts, one per Kafka topic, each
relaunched every minute by NiFi (/root/reference/eQRawToParquet.py et al.,
egal-project-nifi.xml:1836). Here: one parameterized long-running query per
source. Archive files are partitioned by ingest date so downstream
trailing-window reads (ST2/ST3) prune partitions instead of scanning the
full history — the difference between reading 20 minutes and 2 years at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def archive_stream(
    source: DataFrame,
    path: str,
    checkpoint: str,
    partition_by_ingest_date: bool = True,
    trigger_interval: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Append-archive any streaming DataFrame to Parquet, checkpointed.

    Mirrors the reference's writeStream config
    (/root/reference/eQRawToParquet.py:26-32) plus ingest-date partitioning.
    """
    df = source
    if partition_by_ingest_date:
        df = df.withColumn("ingest_date", F.to_date(F.current_timestamp()))
    writer = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by_ingest_date:
        writer = writer.partitionBy("ingest_date")
    if available_now:
        # drain-everything-then-stop mode: checkpointed exactly-once batch
        # catch-up over the same query (the principled version of the
        # reference's relaunch-every-minute cron treatment, SURVEY E1.5)
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
