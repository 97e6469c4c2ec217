"""HTTP ingestion producers (SURVEY S6, S7, S9) — engine-external edges.

The reference ingests via NiFi ``InvokeHTTP`` pollers (AFAD REST API,
egal-project-nifi.xml:4214/4833/6547) and a hand-rolled Python scraper that
logs in, downloads a packed float32 file, and decodes a minute-indexed
window (/root/reference/electricraw.py:11-100). Neither is a Spark job —
they are producers that feed Kafka. This module keeps that boundary:
small, testable producer functions that yield engine-ready records; the
network edge is pluggable (and stubbed in this container, which has no
external connectivity).
"""

from __future__ import annotations

import json
import struct
from collections.abc import Callable, Iterator
from datetime import datetime, timedelta
from typing import Any

#: fetch(url) -> bytes; injectable for tests, stubbed by default.
Fetch = Callable[[str], bytes]

AFAD_FILTER_URL = "https://deprem.afad.gov.tr/apiv2/event/filter"

#: The electric portal's file epoch: minute 0 of the packed float32 file
#: (/root/reference/electricraw.py:64-65 measures minutes since 2000-01-01).
ELECTRIC_EPOCH = datetime(2000, 1, 1)


def _default_fetch(url: str) -> bytes:
    raise NotImplementedError(
        "no external network in this environment — inject a fetch callable"
    )


def poll_earthquake_events(
    start: str, end: str, fetch: Fetch = _default_fetch
) -> list[dict[str, Any]]:
    """One AFAD poll window (S6): GET events between start and end, return
    raw event dicts ready for Kafka. Cadence/windowing (30 s / 20 min etc.,
    BASELINE.md) belongs to the scheduler that calls this."""
    payload = fetch(f"{AFAD_FILTER_URL}?start={start}&end={end}")
    data = json.loads(payload.decode("utf-8"))
    return data if isinstance(data, list) else [data]


def decode_electric_window(
    blob: bytes, start: datetime, nan_fill: float = 0.0
) -> Iterator[dict[str, Any]]:
    """Decode a packed little-endian float32 minute-series window (S7).

    Re-expression of the reference's seek/decode math
    (/root/reference/electricraw.py:64-87): one sample per minute from
    ``start``, NaN → ``nan_fill`` (0.0 is the downstream gap sentinel),
    values rounded to 2 dp, timestamps ISO minute strings.
    """
    n = len(blob) // 4
    values = struct.unpack(f"<{n}f", blob[: n * 4])
    for i, v in enumerate(values):
        ts = start + timedelta(minutes=i)
        out = nan_fill if v != v else round(v, 2)  # NaN check without numpy
        yield {"time": ts.strftime("%Y-%m-%dT%H:%M"), "data": out}


def minute_offset(ts: datetime, epoch: datetime = ELECTRIC_EPOCH) -> int:
    """Byte offset of a minute sample in the packed file (F10):
    minutes-since-epoch × 4 bytes (/root/reference/electricraw.py:64-65)."""
    return int((ts - epoch).total_seconds() // 60) * 4


def resume_point(samples: list[dict[str, Any]]) -> str | None:
    """Incremental-tail resume (S9): the timestamp of the last sample before
    the first gap sentinel, the reference's stop-at-first-0.0 scan
    (/root/reference/electricraw.py:134-153). Returns None if no samples."""
    last_good: str | None = None
    for s in samples:
        if s["data"] == 0.0:
            break
        last_good = s["time"]
    return last_good
