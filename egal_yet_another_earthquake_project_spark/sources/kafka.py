"""Kafka sources/sinks (SURVEY S1, S8) — gated: no broker or connector jar
ships in the test container, so these build the reader/writer but only a
real deployment starts them. Unit tests exercise the downstream transforms
through the file/memory sources instead (same DataFrame contract).

Reference: four copy-pasted scripts each subscribing one topic with
``failOnDataLoss=false`` (/root/reference/eQRawToParquet.py:15-21 ×4);
here one parameterized reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TOPICS = ("earthquakeRaw", "earthquakeRawWeek", "electricRaw", "electricRawWeek")


def kafka_source_options(
    topic: str,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    ending_offsets: str | None = None,
) -> dict[str, str]:
    """The exact option set both Kafka readers hand the connector — a pure
    function so the reader contract is testable without a broker (the
    broker itself is absent in this container; the downstream envelope →
    parse → publish cycle is covered by tests/test_kafka_contract.py).
    The reference hardcodes four copies of these options
    (/root/reference/eQRawToParquet.py:15-21)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if ending_offsets is not None:
        opts["endingOffsets"] = ending_offsets
    return opts


def read_kafka_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Streaming Kafka source (S1). Yields the standard envelope schema
    (schemas.KAFKA_ENVELOPE)."""
    return (
        spark.readStream.format("kafka")
        .options(
            **kafka_source_options(
                topic, bootstrap_servers, starting_offsets, fail_on_data_loss
            )
        )
        .load()
    )


def read_kafka_batch(
    spark: SparkSession, topic: str, bootstrap_servers: str = "localhost:9092"
) -> DataFrame:
    """Batch (bounded) Kafka read — backfill path (ST4)."""
    return (
        spark.read.format("kafka")
        .options(
            **kafka_source_options(topic, bootstrap_servers, ending_offsets="latest")
        )
        .load()
    )


def to_publish_frame(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Record rows → Kafka publish frame (S12 writer side): the full row as
    a JSON ``value`` (NiFi's JsonRecordSetWriter equivalent is
    ``F.to_json(struct(*))``), optional business key as ``key`` for
    partition affinity."""
    from pyspark.sql import functions as F

    value = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    cols = [value.alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def write_kafka(
    df: DataFrame,
    topic: str,
    bootstrap_servers: str = "localhost:9092",
    max_request_size: int = 900_000,
) -> None:
    """Batch Kafka producer sink (S8). The reference hand-batches JSON
    arrays to ≤900 KB messages (/root/reference/electricraw.py:102-129,179);
    Kafka's own ``max.request.size`` bounds message size here, and Spark
    parallelizes the produce across executors."""
    (
        df.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("kafka.max.request.size", str(max_request_size))
        .option("topic", topic)
        .save()
    )
