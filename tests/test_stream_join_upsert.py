"""Stream-stream correlation join and CDC upsert tests."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql import types as T

from egal_yet_another_earthquake_project_spark.operators.upsert import (
    scd2_merge,
    upsert,
)
from egal_yet_another_earthquake_project_spark.sources.files import stream_parquet_dir
from egal_yet_another_earthquake_project_spark.streaming.joins import correlate_streams

EVENTS_S = T.StructType(
    [
        T.StructField("eventID", T.LongType(), False),
        T.StructField("date", T.TimestampType(), False),
        T.StructField("magnitude", T.DoubleType(), False),
    ]
)
TICKS_S = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("data", T.DoubleType(), False),
    ]
)


def test_stream_stream_correlation_join(spark, tmp_path: Path):
    events = [(1, "2023-02-06 04:17:00", 7.7), (2, "2023-02-06 10:00:00", 5.0)]
    ticks = [
        ("2023-02-06 04:14:00", 11.0),  # within ±5 min of event 1
        ("2023-02-06 04:21:00", 12.0),  # within
        ("2023-02-06 04:30:00", 13.0),  # outside
        ("2023-02-06 09:59:00", 14.0),  # within ±5 min of event 2
    ]
    e_src, t_src = tmp_path / "e", tmp_path / "t"
    spark.createDataFrame(events, "eventID long, date string, magnitude double").withColumn(
        "date", F.to_timestamp("date")
    ).write.parquet(str(e_src))
    spark.createDataFrame(ticks, "time string, data double").withColumn(
        "time", F.to_timestamp("time")
    ).write.parquet(str(t_src))

    joined = correlate_streams(
        stream_parquet_dir(spark, str(e_src), EVENTS_S),
        stream_parquet_dir(spark, str(t_src), TICKS_S),
        tolerance_minutes=5,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("corr_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r.eventID, r.data) for r in spark.sql("SELECT * FROM corr_out").collect()
    )
    assert got == [(1, 11.0), (1, 12.0), (2, 14.0)], got


def test_upsert_last_writer_wins(spark):
    target = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "id long, payload string, v int"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 2), (2, "b3", 3), (4, "d", 1)], "id long, payload string, v int"
    )
    out = {r.id: r.payload for r in upsert(target, updates, ["id"], order_col="v").collect()}
    assert out == {1: "a", 2: "b3", 3: "c", 4: "d"}


def test_scd2_merge_closes_current_versions(spark):
    target = spark.createDataFrame(
        [(1, "2023-01-01 00:00:00", "v1", None, True)],
        "id long, eff string, payload string, valid_to string, is_current boolean",
    ).select(
        "id",
        F.to_timestamp("eff").alias("eff"),
        "payload",
        F.to_timestamp("valid_to").alias("valid_to"),
        "is_current",
    )
    updates = spark.createDataFrame(
        [(1, "2023-06-01 00:00:00", "v2")], "id long, eff string, payload string"
    ).select("id", F.to_timestamp("eff").alias("eff"), "payload")

    out = scd2_merge(target, updates, ["id"], "eff")
    rows = sorted(out.collect(), key=lambda r: r.eff)
    assert len(rows) == 2
    old, new = rows
    assert old.payload == "v1" and old.is_current is False
    assert old.valid_to == new.eff
    assert new.payload == "v2" and new.is_current is True and new.valid_to is None


def test_scd2_from_log_collapses_and_closes(spark):
    """Hand-checkable change log: key 1 goes A→A→B→A (A-runs collapse;
    the later A is a NEW version, not a merge with the first), key 2
    never changes (one open version)."""
    import datetime as dt

    from egal_yet_another_earthquake_project_spark.operators.upsert import (
        scd2_from_log,
    )

    def d(day):
        return dt.date(2024, 1, day)

    log = spark.createDataFrame(
        [
            (1, d(1), "A", 10),
            (1, d(2), "A", 11),
            (1, d(3), "B", 12),
            (1, d(5), "A", 13),
            (2, d(2), "X", 14),
            (2, d(9), "X", 15),
        ],
        "k int, ts date, attr string, seq int",
    )
    rows = sorted(
        map(
            tuple,
            scd2_from_log(log, ["k"], "ts", ["attr"], tiebreak=["seq"]).collect(),
        )
    )
    assert rows == [
        (1, "A", d(1), d(3), False),
        (1, "A", d(5), None, True),
        (1, "B", d(3), d(5), False),
        (2, "X", d(2), None, True),
    ], rows
