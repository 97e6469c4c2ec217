"""Python DataSource API: the earthquake feed mounted as a first-class
``spark.read.format(...)`` with time-sliced parallel fetch."""

from __future__ import annotations

import json

from egal_yet_another_earthquake_project_spark.sources.datasource import register

_FIXTURE = json.dumps(
    [
        {"eventID": "e1", "date": "2023-02-06T04:17", "magnitude": 7.7,
         "latitude": 37.17, "longitude": 37.08, "depth": 8.6,
         "location": "Pazarcik"},
        {"eventID": "e2", "date": "2023-02-06T13:24", "magnitude": 7.6,
         "latitude": 38.09, "longitude": 37.24, "depth": 7.0,
         "location": "Elbistan"},
        {"eventID": "e3", "date": "2023-02-08T10:00", "magnitude": 4.1,
         "latitude": 38.0, "longitude": 37.0, "depth": 5.0,
         "location": "aftershock"},
        {"eventID": "out", "date": "2023-03-01T00:00", "magnitude": 3.0,
         "latitude": 0.0, "longitude": 0.0, "depth": 0.0,
         "location": "outside window"},
    ]
)


def _read(spark, **opts):
    register(spark)
    reader = (
        spark.read.format("earthquake_http")
        .option("start", "2023-02-06T00:00")
        .option("end", "2023-02-09T00:00")
        .option("fixture_json", _FIXTURE)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_reads_typed_rows_within_window(spark):
    df = _read(spark)
    rows = {r.eventID: r for r in df.collect()}
    assert set(rows) == {"e1", "e2", "e3"}  # 'out' is outside [start,end)
    assert rows["e1"].magnitude == 7.7
    assert rows["e1"].depth == 8.6
    assert df.schema["magnitude"].dataType.typeName() == "double"


def test_window_is_sliced_into_parallel_partitions(spark):
    df = _read(spark)  # 3 days @ default 24h slices
    assert df.rdd.getNumPartitions() == 3
    # finer slices -> more fetch tasks, same rows
    df6 = _read(spark, slice_hours="6")
    assert df6.rdd.getNumPartitions() == 12
    assert sorted(r.eventID for r in df6.collect()) == ["e1", "e2", "e3"]


def test_slices_are_disjoint_no_duplicates(spark):
    df = _read(spark, slice_hours="1")
    ids = [r.eventID for r in df.collect()]
    assert sorted(ids) == ["e1", "e2", "e3"]  # each event exactly once


def test_filter_pushdown_composes_with_catalyst(spark):
    df = _read(spark).filter("magnitude >= 7.0").select("eventID", "location")
    assert sorted(r.eventID for r in df.collect()) == ["e1", "e2"]


def test_stream_reader_tails_with_checkpointed_offsets(spark, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("earthquake_http")
        .option("start", "2023-02-06T00:00")
        .option("fixture_json", _FIXTURE)
        .option("slice_hours", "24")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("eq_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        ids = sorted(r.eventID for r in spark.table("eq_stream").collect())
    finally:
        q.stop()
    # everything from start up to the feed's high-water minute, once each
    assert ids == ["e1", "e2", "e3", "out"]
