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


#: tracking parameters a crawl canonicalizer strips before URL dedup —
#: the standard analytics/click-id families; everything else is kept
#: because it may be content-addressing (page=2, q=term).
TRACKING_PARAMS_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|ref)="


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL for crawl-level dedup (round 12): strip
    the fragment, lowercase scheme and host, drop default ports
    (http:80 / https:443), collapse duplicate path slashes, default an
    empty path to '/', sort the query parameters, and drop tracking
    parameters (:data:`TRACKING_PARAMS_RE`). Two fetches of the same
    resource — differing only in case, fragment, utm tags, or query
    order — canonicalize to the SAME string, which is what makes
    exact-dedup on the canonical key catch URL-level duplicates before
    any content hashing.

    Pure built-in expressions end to end (regexp + higher-order array
    functions): whole-stage codegen, no UDF, no shuffle — at 100 TB
    this is a free map expression on the crawl frame."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path0 = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path0 == "", F.lit("/")).otherwise(
        F.regexp_replace(path0, "/{2,}", "/")
    )
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAMS_RE),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )
