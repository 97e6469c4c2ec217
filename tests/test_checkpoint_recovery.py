"""Checkpoint recovery: a stopped stream restarted with the same
checkpoint resumes exactly-once — no re-archived rows, dedup state intact
across the restart (the property the reference's relaunch-every-minute
cron treatment silently relied on Spark to provide)."""

from __future__ import annotations

from pathlib import Path

from egal_yet_another_earthquake_project_spark.schemas import KAFKA_ENVELOPE
from egal_yet_another_earthquake_project_spark.sources.files import stream_parquet_dir
from egal_yet_another_earthquake_project_spark.streaming.bronze import archive_stream
from egal_yet_another_earthquake_project_spark.streaming.silver import (
    dedup_stream,
    parsed_stream,
)
from egal_yet_another_earthquake_project_spark.testing import fixtures


def _write_batch(spark, payloads, path: Path):
    spark.createDataFrame(
        fixtures.kafka_envelopes(payloads), KAFKA_ENVELOPE
    ).coalesce(1).write.parquet(str(path))


def test_archive_resumes_exactly_once(spark, tmp_path: Path):
    events1 = fixtures.earthquake_events(n=10, seed=1)
    events2 = fixtures.earthquake_events(n=10, seed=2)
    src = tmp_path / "in"
    _write_batch(spark, events1, src / "b1")

    out, ckpt = str(tmp_path / "archive"), str(tmp_path / "ck")
    q1 = archive_stream(stream_parquet_dir(spark, str(src / "*"), KAFKA_ENVELOPE), out, ckpt)
    q1.processAllAvailable()
    q1.stop()
    n_first = spark.read.parquet(out).count()
    assert n_first == len(events1)

    # new data lands while the stream is DOWN; restart from the checkpoint
    _write_batch(spark, events2, src / "b2")
    q2 = archive_stream(stream_parquet_dir(spark, str(src / "*"), KAFKA_ENVELOPE), out, ckpt)
    q2.processAllAvailable()
    q2.stop()

    archived = spark.read.parquet(out)
    assert archived.count() == len(events1) + len(events2)  # no replays, no loss
    payloads = {bytes(r.value).decode() for r in archived.collect()}
    import json

    expected = {json.dumps(e, ensure_ascii=False) for e in events1 + events2}
    assert payloads == expected


def test_dedup_state_survives_restart(spark, tmp_path: Path):
    """An eventID seen before the restart must still be recognized as a
    duplicate after it — the dropDuplicatesWithinWatermark state store is
    restored from the checkpoint."""
    e = fixtures.earthquake_events(n=1, dup_rate=0.0, update_rate=0.0, bad_date_rate=0.0)[0]
    src = tmp_path / "in"
    out = str(tmp_path / "silver")
    _write_batch(spark, [e], src / "b1")

    def run_silver():
        # parquet sink: the memory sink refuses checkpoint recovery
        stream = stream_parquet_dir(spark, str(src / "*"), KAFKA_ENVELOPE)
        silver = dedup_stream(parsed_stream(stream))
        return (
            silver.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )

    q1 = run_silver()
    q1.processAllAvailable()
    q1.stop()
    assert spark.read.parquet(out).count() == 1

    # the SAME event re-arrives after the restart (overlapping poll)
    _write_batch(spark, [e], src / "b2")
    q2 = run_silver()
    q2.processAllAvailable()
    q2.stop()
    # restored state must suppress the replayed id: still exactly one row
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1, rows
    assert rows[0].eventID == int(e["eventID"])
