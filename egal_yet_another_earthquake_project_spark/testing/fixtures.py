"""Deterministic domain fixtures (FIXTURES.md §1-5).

Seeded generators for the earthquake/electric domain entities, covering
the reference's edge cases: overlapping-poll full-row duplicates (ST2),
same-eventID re-sends with isEventUpdate/lastUpdateDate (ST5), unparseable
dates (F11), provinces outside every region list (F6 else-branch), and
0.0 gap runs in the electric series (ST7). Pure-Python value generation
(no Spark dependency) so producers and tests share them.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta
from typing import Any

from egal_yet_another_earthquake_project_spark.dims import province_region_rows

#: Provinces in no region list → '' bucket (reference else-branch).
UNLISTED_PROVINCES = ("Rize", "Kilis", "Yalova", "Karaman")

_LISTED = [p for p, _ in province_region_rows()]


def earthquake_events(
    n: int = 200,
    seed: int = 42,
    start: datetime = datetime(2023, 2, 1),
    dup_rate: float = 0.15,
    update_rate: float = 0.10,
    bad_date_rate: float = 0.02,
) -> list[dict[str, Any]]:
    """Raw AFAD-shaped event dicts (FIXTURES.md §1), all-string fields.

    Emits ~n·(1+dup_rate+update_rate) records: base events, verbatim
    duplicates (overlapping 20-min polls), and update re-sends sharing the
    eventID with a later lastUpdateDate and a revised magnitude.
    """
    rng = random.Random(seed)
    provinces = _LISTED + list(UNLISTED_PROVINCES)
    out: list[dict[str, Any]] = []
    for i in range(n):
        ts = start + timedelta(minutes=rng.randrange(0, 60 * 24 * 28))
        # index 7 is always malformed (when enabled) so the F11 edge case
        # is present at any n/seed, plus the random rate on top.
        bad_date = (rng.random() < bad_date_rate) or (bad_date_rate > 0 and i == 7)
        province = rng.choice(provinces)
        event = {
            "date": "not a timestamp" if bad_date else ts.strftime("%Y-%m-%d %H:%M:%S"),
            "rms": f"{rng.uniform(0.1, 2.0):.2f}",
            "eventID": str(500000 + i),
            "location": f"loc-{i} ({province})",
            "latitude": f"{rng.uniform(35.0, 42.5):.4f}",
            "longitude": f"{rng.uniform(25.0, 45.0):.4f}",
            "depth": f"{rng.uniform(0.0, 100.0):.1f}",
            "type": "EQ",
            "magnitude": f"{rng.uniform(0.5, 7.8):.1f}",  # straddles the 4.0 threshold
            "country": "Türkiye",
            "province": province,
            "district": f"d{rng.randrange(30)}",
            "neighborhood": None if rng.random() < 0.3 else f"n{rng.randrange(100)}",
            "isEventUpdate": "false",
            "lastUpdateDate": None,
        }
        out.append(event)
        if rng.random() < dup_rate:  # ST2 overlap duplicate
            out.append(dict(event))
        if rng.random() < update_rate and not bad_date:  # ST5 re-send
            upd = dict(event)
            upd["isEventUpdate"] = "true"
            upd["magnitude"] = f"{float(event['magnitude']) + 0.1:.1f}"
            upd["lastUpdateDate"] = (ts + timedelta(hours=2)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            out.append(upd)
    return out


def electric_ticks(
    minutes: int = 60 * 24,
    seed: int = 42,
    start: datetime = datetime(2023, 2, 1),
    gap_runs: tuple[tuple[int, int], ...] = ((100, 5), (700, 12)),
) -> list[dict[str, Any]]:
    """Electric-field minute series (FIXTURES.md §3): sinusoid + noise,
    2-dp rounding, multi-minute 0.0 gap runs at fixed offsets."""
    import math

    rng = random.Random(seed)
    gap_minutes = {g + k for g, length in gap_runs for k in range(length)}
    out = []
    for m in range(minutes):
        ts = start + timedelta(minutes=m)
        value = 0.0 if m in gap_minutes else round(
            50.0 + 10.0 * math.sin(m / 120.0) + rng.gauss(0.0, 1.5), 2
        )
        out.append({"time": ts.strftime("%Y-%m-%dT%H:%M"), "data": value})
    return out


def kafka_envelopes(
    payloads: list[dict[str, Any]] | list[str],
    topic: str = "earthquakeRaw",
) -> list[tuple]:
    """Wrap JSON payloads in the Kafka source envelope rows
    (FIXTURES.md §4) — feed to spark.createDataFrame(..., KAFKA_ENVELOPE)."""
    rows = []
    for i, p in enumerate(payloads):
        body = p if isinstance(p, str) else json.dumps(p, ensure_ascii=False)
        rows.append((None, bytearray(body.encode("utf-8")), topic, 0, i, None, 0))
    return rows
