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
