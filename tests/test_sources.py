"""Producer-side source logic tests (SURVEY S6/S7/S9/F10): binary window
decode, minute-offset seek math, gap-aware resume, Kafka envelope fixture."""

from __future__ import annotations

import json
import math
import struct
from datetime import datetime

from egal_yet_another_earthquake_project_spark.sources import http as src


def test_decode_electric_window():
    blob = struct.pack("<6f", 1.25, 2.345, float("nan"), 0.0, 99.999, -3.5)
    out = list(src.decode_electric_window(blob, datetime(2023, 2, 1, 10, 0)))
    assert [o["data"] for o in out] == [1.25, 2.35, 0.0, 0.0, 100.0, -3.5]
    assert out[0]["time"] == "2023-02-01T10:00"
    assert out[5]["time"] == "2023-02-01T10:05"
    assert all(not math.isnan(o["data"]) for o in out)


def test_minute_offset_seek_math():
    # minutes-since-2000-01-01 × 4 bytes (reference electricraw.py:64-65)
    assert src.minute_offset(datetime(2000, 1, 1, 0, 0)) == 0
    assert src.minute_offset(datetime(2000, 1, 1, 0, 1)) == 4
    assert src.minute_offset(datetime(2000, 1, 2, 0, 0)) == 24 * 60 * 4


def test_resume_point_stops_at_first_gap():
    samples = [
        {"time": "2023-02-01T10:00", "data": 1.0},
        {"time": "2023-02-01T10:01", "data": 2.0},
        {"time": "2023-02-01T10:02", "data": 0.0},  # gap sentinel
        {"time": "2023-02-01T10:03", "data": 3.0},  # after gap — ignored
    ]
    assert src.resume_point(samples) == "2023-02-01T10:01"
    assert src.resume_point([]) is None
    assert src.resume_point([{"time": "t", "data": 0.0}]) is None


def test_poll_earthquake_events_parses_response():
    payload = json.dumps([{"eventID": "1"}, {"eventID": "2"}]).encode()
    got = src.poll_earthquake_events(
        "2023-01-01", "2023-01-02", fetch=lambda url: payload
    )
    assert [e["eventID"] for e in got] == ["1", "2"]


def test_default_fetch_is_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        src.poll_earthquake_events("a", "b")


def test_read_table_normalizes_both_events_ts_layouts(spark, tmp_path):
    """The driver's events.parquet has shipped ts as INT64 TIMESTAMP(NANOS)
    and as TIMESTAMP(MICROS)/NTZ across testdata generations; read_table
    must yield the same session-TZ timestamps for both physical layouts
    (this exact drift broke every events query in one driver round)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    ts = [1700000000_000000, 1700000060_500000]  # micros
    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["a", "b"]),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array(["{}", "{}"]),
    }
    for sub, typ, vals in [
        ("nanos", pa.timestamp("ns"), [t * 1000 for t in ts]),
        ("micros", pa.timestamp("us"), ts),
    ]:
        d = tmp_path / sub
        d.mkdir()
        pq.write_table(
            pa.table({**base, "ts": pa.array(vals, typ)}),
            str(d / "events.parquet"),
            use_deprecated_int96_timestamps=False,
            coerce_timestamps=None,
        )
    a = {r.event_id: r.ts for r in read_table(spark, str(tmp_path / "nanos"), "events").collect()}
    b = {r.event_id: r.ts for r in read_table(spark, str(tmp_path / "micros"), "events").collect()}
    assert a == b and len(a) == 2
    assert read_table(spark, str(tmp_path / "micros"), "events").schema["ts"].dataType.typeName() == "timestamp"


def test_read_parquet_evolved_conforms_mixed_schema_files(spark, tmp_path):
    """Files written before a column existed read back as typed nulls;
    files with extra historical columns prune; order/type conform to the
    target schema."""
    from pyspark.sql import types as T

    from egal_yet_another_earthquake_project_spark.sources.files import (
        read_parquet_evolved,
    )

    old = spark.createDataFrame([(1, "a")], "id long, name string")
    new = spark.createDataFrame(
        [(2, "b", 9.5, "junk")], "id long, name string, score double, legacy string"
    )
    old.write.parquet(str(tmp_path / "d"), mode="append")
    new.write.parquet(str(tmp_path / "d"), mode="append")

    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    out = read_parquet_evolved(spark, str(tmp_path / "d"), target)
    assert out.columns == ["id", "name", "score"]
    rows = {r.id: (r.name, r.score) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_interchange_formats_round_trip(spark, tmp_path):
    """documents round-trips bit-identically through ORC, CSV (quoted
    text with commas/quotes included), and JSON-lines with explicit
    schemas; CSV/JSON without a schema are refused (inference = an
    extra full pass, nondeterministic across files)."""
    import pytest

    from egal_yet_another_earthquake_project_spark.sources.files import (
        read_format,
        read_table,
        write_format,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    # plant hostile CSV content: commas, quotes, newline
    hostile = docs.limit(5).selectExpr(
        "doc_id + 1000000 AS doc_id",
        """concat(text, ', "quoted, part"\nsecond line') AS text""",
        "lang", "source", "n_chars",
    )
    frame = docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        hostile
    )
    want = {tuple(r) for r in frame.collect()}
    schema = frame.schema
    for fmt in ("orc", "csv", "json"):
        path = str(tmp_path / fmt)
        write_format(frame, path, fmt)
        got = {
            tuple(r)
            for r in read_format(spark, path, fmt, schema=schema)
            .select("doc_id", "text", "lang", "source", "n_chars")
            .collect()
        }
        assert got == want, f"{fmt} round trip diverged"

    for fmt in ("csv", "json"):
        with pytest.raises(ValueError, match="explicit schema"):
            read_format(spark, str(tmp_path / fmt), fmt)
    with pytest.raises(ValueError, match="unsupported"):
        write_format(frame, str(tmp_path / "x"), "avro")
