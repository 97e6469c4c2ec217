"""Engine-native Python DataSource for the earthquake REST feed —
``spark.read.format("earthquake_http")`` (Spark 4 Python DataSource API).

The reference polls its REST API from NiFi, one serial ``InvokeHTTP``
loop (egal-project-nifi.xml:4214); :mod:`sources.http` re-expressed that
as testable producer functions. This module goes one step further and
mounts the feed INSIDE the engine: the poll window is split into
disjoint time slices, each slice is an ``InputPartition``, and executors
fetch their slices in parallel — a year of backfill becomes a
365-task scan instead of a driver loop, with the engine handling
retries/locality/speculation like any other scan.

The container has no network, so the transport is pluggable via options:
``fixture_json`` (a JSON array of event dicts) serves as the offline
transport; a real deployment passes ``url`` instead and the executor-side
``read()`` fetches it. Everything else — slicing, schema projection,
row shaping — is identical in both modes and is what the tests pin.

Raw-feed schema matches :data:`schemas.EVENTS_RAW`'s core fields (the
AFAD payload keys used by /root/reference/sparktoELKstream.py:56-66).
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: ISO minute format used by the feed and the reference's windowing.
_FMT = "%Y-%m-%dT%H:%M"

#: Output schema: the typed core of the raw feed.
_SCHEMA = (
    "eventID string, date string, magnitude double, latitude double, "
    "longitude double, depth double, location string"
)


class _Slice(InputPartition):
    def __init__(self, start: str, end: str):
        self.start = start
        self.end = end


class EarthquakeDataSource(DataSource):
    """``format("earthquake_http")`` — options:

    - ``start`` / ``end``: ISO-minute window bounds (required)
    - ``slice_hours``: partition granularity (default 24 — one fetch
      task per day of window)
    - ``fixture_json``: offline transport (JSON array of event dicts);
      mutually exclusive with a live ``url``
    """

    @classmethod
    def name(cls) -> str:
        return "earthquake_http"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "EarthquakeReader":
        return EarthquakeReader(self.options)

    def streamReader(self, schema) -> "EarthquakeStreamReader":
        return EarthquakeStreamReader(self.options)


class EarthquakeReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = datetime.strptime(options["start"], _FMT)
        self.end = datetime.strptime(options["end"], _FMT)
        self.slice_hours = int(options.get("slice_hours", "24"))
        self.fixture_json = options.get("fixture_json")
        self.url = options.get("url")
        if self.fixture_json is None and self.url is None:
            raise ValueError("pass fixture_json (offline) or url (live)")

    def partitions(self) -> list[_Slice]:
        """Disjoint [start, end) time slices — one fetch task each."""
        out: list[_Slice] = []
        cur = self.start
        step = timedelta(hours=self.slice_hours)
        while cur < self.end:
            nxt = min(cur + step, self.end)
            out.append(_Slice(cur.strftime(_FMT), nxt.strftime(_FMT)))
            cur = nxt
        return out

    def read(self, partition: _Slice):
        """Executor-side: fetch/decode ONE slice, emit typed rows. Slices
        are disjoint so no cross-partition dedup is needed."""
        if self.fixture_json is not None:
            events = json.loads(self.fixture_json)
        else:  # pragma: no cover - no network in this container
            from egal_yet_another_earthquake_project_spark.sources.http import (
                poll_earthquake_events,
            )
            import urllib.request

            events = poll_earthquake_events(
                partition.start,
                partition.end,
                fetch=lambda u: urllib.request.urlopen(u).read(),
            )
        for ev in events:
            d = str(ev.get("date", ""))
            if not (partition.start <= d < partition.end):
                continue
            yield (
                str(ev.get("eventID", "")),
                d,
                float(ev.get("magnitude", 0.0)),
                float(ev.get("latitude", 0.0)),
                float(ev.get("longitude", 0.0)),
                float(ev.get("depth", 0.0)),
                str(ev.get("location", "")),
            )


class EarthquakeStreamReader(DataSourceStreamReader):
    """Incremental tail (S9) as an engine-native micro-batch source:
    ``spark.readStream.format("earthquake_http")``.

    Offsets are ISO minutes — exactly the reference's resume cursor
    (stop-at-last-good-minute, /root/reference/electricraw.py:134-153),
    but held by Spark's checkpointed offset log instead of a hand-rolled
    state file: restart-safe, exactly-once per minute-slice, and each
    micro-batch's window is again fetched as parallel slices."""

    def __init__(self, options: dict):
        self.start = options["start"]
        self.slice_hours = int(options.get("slice_hours", "24"))
        self.fixture_json = options.get("fixture_json")
        #: In fixture mode the feed's "now" is the max event minute + 1
        #: (everything present is available); a live reader would probe
        #: the endpoint instead.
        if self.fixture_json is not None:
            events = json.loads(self.fixture_json)
            dates = sorted(str(e.get("date", "")) for e in events)
            last = datetime.strptime(dates[-1], _FMT) if dates else None
            self._latest = (
                (last + timedelta(minutes=1)).strftime(_FMT)
                if last
                else self.start
            )
        else:  # pragma: no cover - no network in this container
            raise ValueError("streaming requires fixture_json offline")

    def initialOffset(self) -> dict:
        return {"minute": self.start}

    def latestOffset(self) -> dict:
        return {"minute": max(self._latest, self.start)}

    def partitions(self, start: dict, end: dict):
        cur = datetime.strptime(start["minute"], _FMT)
        stop = datetime.strptime(end["minute"], _FMT)
        step = timedelta(hours=self.slice_hours)
        out: list[_Slice] = []
        while cur < stop:
            nxt = min(cur + step, stop)
            out.append(_Slice(cur.strftime(_FMT), nxt.strftime(_FMT)))
            cur = nxt
        return out or [_Slice(start["minute"], end["minute"])]

    def read(self, partition: _Slice):
        events = json.loads(self.fixture_json)
        for ev in events:
            d = str(ev.get("date", ""))
            if not (partition.start <= d < partition.end):
                continue
            yield (
                str(ev.get("eventID", "")),
                d,
                float(ev.get("magnitude", 0.0)),
                float(ev.get("latitude", 0.0)),
                float(ev.get("longitude", 0.0)),
                float(ev.get("depth", 0.0)),
                str(ev.get("location", "")),
            )

    def commit(self, end: dict) -> None:
        """Offsets below ``end`` are durably processed — nothing to
        release (the feed is remote); the checkpoint owns the cursor."""


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(EarthquakeDataSource)
