"""Broker-less Kafka contract tests (SURVEY S1/S8/S12).

No broker ships in this container, so the one reference edge that stayed
pytest-unverified in round 1 — the Kafka ingest/publish cycle
(/root/reference/eQRawToParquet.py:15-21, electricraw.py producer) — is
contract-tested here end to end: the reader option set as a pure
function, and the full envelope → decode → parse → publish → envelope
cycle over recorded fixture payloads in BOTH directions. What a real
broker adds (offsets, rebalance) belongs to Kafka, not to this engine's
transforms.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.operators.parse import (
    decode_envelope,
    parse_events_raw,
)
from egal_yet_another_earthquake_project_spark.schemas import (
    EARTHQUAKE_RAW,
    KAFKA_ENVELOPE,
)
from egal_yet_another_earthquake_project_spark.sources.kafka import (
    kafka_source_options,
    to_publish_frame,
)
from egal_yet_another_earthquake_project_spark.testing.fixtures import (
    earthquake_events,
    kafka_envelopes,
)


def test_kafka_source_options_contract():
    """The option dict both readers hand the connector — streaming and
    bounded-backfill (ST4) variants."""
    assert kafka_source_options("earthquakeRaw") == {
        "kafka.bootstrap.servers": "localhost:9092",
        "subscribe": "earthquakeRaw",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }
    batch = kafka_source_options(
        "electricRaw",
        bootstrap_servers="broker:9093",
        fail_on_data_loss=True,
        ending_offsets="latest",
    )
    assert batch["endingOffsets"] == "latest"
    assert batch["failOnDataLoss"] == "true"
    assert batch["kafka.bootstrap.servers"] == "broker:9093"


def test_envelope_decode_parse_roundtrip(spark):
    """Consume direction: recorded fixture payloads wrapped in the exact
    Kafka envelope schema parse back to their source field values."""
    events = earthquake_events(n=50)
    env = spark.createDataFrame(kafka_envelopes(events), KAFKA_ENVELOPE)
    parsed = parse_events_raw(decode_envelope(env)).collect()
    assert len(parsed) == len(events)
    got = sorted((r.eventID, r.magnitude, r.province, r.date) for r in parsed)
    want = sorted(
        (e["eventID"], e["magnitude"], e["province"], e["date"]) for e in events
    )
    assert got == want


def _as_envelope(publish_df, topic: str):
    """What the broker does to a produced record: key/value become bytes,
    topic/partition/offset metadata appear."""
    return publish_df.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.lit(0).alias("partition"),
        (F.monotonically_increasing_id()).alias("offset"),
        F.lit(None).cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def test_publish_then_consume_roundtrip(spark):
    """Produce direction: raw rows → to_publish_frame (S12 writer) →
    simulated broker envelope → decode → parse recovers the rows exactly,
    and the publish key carries the business key for partition affinity."""
    events = earthquake_events(n=40)
    raw = spark.createDataFrame(
        [tuple(e[f.name] for f in EARTHQUAKE_RAW.fields) for e in events],
        EARTHQUAKE_RAW,
    )
    pub = to_publish_frame(raw, key_col="eventID")
    # keys: business key as string
    keys = {r.key for r in pub.select("key").collect()}
    assert keys == {e["eventID"] for e in events}
    # values: valid JSON of the full row
    one = json.loads(pub.select("value").first().value)
    assert set(one) <= {f.name for f in EARTHQUAKE_RAW.fields}

    consumed = parse_events_raw(decode_envelope(_as_envelope(pub, "earthquakeRaw")))
    got = sorted(map(tuple, consumed.collect()))
    want = sorted(map(tuple, raw.collect()))
    assert got == want
