"""Scalar column functions (SURVEY §2.8) — all built-in, JVM-side.

Every scalar the reference computes with Python UDFs or row-at-a-time
closures is expressed here as a Catalyst expression: whole-stage-codegen
friendly, no Python worker in the hot path. Reference citations per
function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minute-grain event-time format used throughout the reference
#: (/root/reference/sparktoELKstream.py:99).
MINUTE_FORMAT = "yyyy-MM-dd'T'HH:mm"

#: Fallback timestamp for unparseable dates
#: (/root/reference/sparktoELKstream.py:22-27 defaults to datetime(2010,1,1)).
DEFAULT_DATE = "2010-01-01 00:00:00"


def decode_utf8(col: Column | str) -> Column:
    """Kafka binary value → UTF-8 string.

    The reference uses a per-row Python UDF for this
    (/root/reference/sparktoELKstream.py:77). A plain cast is semantically
    identical and stays in codegen.
    """
    return F.col(col).cast("string") if isinstance(col, str) else col.cast("string")


def minute_bucket(ts: Column | str) -> Column:
    """Truncate a timestamp to minute grain (F2) — keeps TimestampType so
    joins/windows still work; format with :func:`minute_string` only at a
    string-typed sink."""
    return F.date_trunc("minute", ts)


def minute_string(ts: Column | str) -> Column:
    """Minute-grain string form, reference sink format
    (/root/reference/sparktoELKstream.py:99)."""
    return F.date_format(ts, MINUTE_FORMAT)


def null_safe_timestamp(col: Column | str, default: str = DEFAULT_DATE) -> Column:
    """Parse a timestamp string, defaulting like the reference's
    date_formatter (F11, /root/reference/sparktoELKstream.py:22-27).
    ``try_to_timestamp`` so malformed input degrades to the default instead
    of failing the job under ANSI mode (dirty upstream data is a given)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.try_to_timestamp(c), F.lit(default).cast("timestamp"))


def point_location(lat: Column | str, lon: Column | str) -> Column:
    """Kibana geo-point string ``"lat,lon"`` (F5,
    /root/reference/sparktoELKstream.py:104)."""
    return F.concat_ws(",", F.col(lat) if isinstance(lat, str) else lat,
                       F.col(lon) if isinstance(lon, str) else lon)


def nan_to_zero(col: Column | str) -> Column:
    """Electric-series gap fill: NaN/null → 0.0 (F7,
    /root/reference/electricraw.py:76-86). 0.0 doubles as the gap sentinel."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.isnan(c) | c.isNull(), F.lit(0.0)).otherwise(c)


def round2(col: Column | str) -> Column:
    """2-dp rounding of electric samples (F8, /root/reference/electricraw.py:85)."""
    return F.round(col, 2)


def trt_to_utc(ts: Column | str) -> Column:
    """Reference producer emits Istanbul local time shifted by hand (F9,
    /root/reference/electricraw.py:78,84); do it properly with the tz db."""
    return F.to_utc_timestamp(ts, "Europe/Istanbul")


def utc_to_trt(ts: Column | str) -> Column:
    return F.from_utc_timestamp(ts, "Europe/Istanbul")


def is_gap(col: Column | str) -> Column:
    """The electric producer's gap sentinel check (ST7,
    /root/reference/electricraw.py:134-138)."""
    c = F.col(col) if isinstance(col, str) else col
    return c == F.lit(0.0)
