"""WARC container lane (llm/warc.py, round 12): spec-shaped encode,
STRICT framing walk (truncation / sync loss / missing headers raise),
HTTP response head split, and the Spark fan-out lane composing with the
HTML extractor."""

from __future__ import annotations

import pytest

from egal_yet_another_earthquake_project_spark.llm.html import (
    extract_text_from_html,
    render_test_page,
)
from egal_yet_another_earthquake_project_spark.llm.warc import (
    encode_warc,
    extract_warc_pages,
    parse_warc,
)

PAGES = [
    ("http://example.com/doc/1", render_test_page(1, "alpha beta").encode()),
    ("http://example.com/doc/2", render_test_page(2, "gamma").encode()),
]


def test_round_trip_preserves_records_and_bodies():
    recs = parse_warc(encode_warc(PAGES))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "response"]
    assert recs[0]["http_status"] is None and recs[0]["body"] is None
    for (uri, html), rec in zip(PAGES, recs[1:]):
        assert rec["target_uri"] == uri
        assert rec["http_status"] == 200
        assert rec["body"] == html  # byte-exact through HTTP framing


def test_truncated_and_desynced_containers_raise():
    blob = encode_warc(PAGES)
    with pytest.raises(ValueError, match="truncated|separator"):
        parse_warc(blob[:-10])
    with pytest.raises(ValueError, match="version marker"):
        parse_warc(b"JUNK" + blob)
    # Content-Length lie: shrink a record's declared length by one — the
    # separator lands in the wrong place and the walk must refuse
    bad = blob.replace(
        f"Content-Length: {len(PAGES[0][1])}".encode(),
        f"Content-Length: {len(PAGES[0][1]) - 1}".encode(),
        1,
    )
    with pytest.raises(ValueError):
        parse_warc(bad)


def test_missing_content_length_raises():
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n")


def test_spark_lane_fans_out_and_composes_with_html_extraction(spark):
    # two WARC files x two pages -> four response rows; the HTML lane
    # then recovers each page's text exactly
    pages2 = [
        ("http://example.com/doc/3", render_test_page(3, "delta eps").encode()),
        ("http://example.com/doc/4", render_test_page(4, "zeta").encode()),
    ]
    warcs = spark.createDataFrame(
        [(0, encode_warc(PAGES)), (1, encode_warc(pages2))],
        "gid long, payload binary",
    )
    recs = extract_warc_pages(warcs)
    rows = recs.collect()
    assert len(rows) == 4  # warcinfo records filtered out
    assert all(r.http_status == 200 for r in rows)
    ext = extract_text_from_html(
        recs.selectExpr(
            "CAST(regexp_extract(target_uri, 'doc/([0-9]+)$', 1) AS LONG) AS doc_id",
            "html",
        )
    )
    got = {r.doc_id: r.text for r in ext.collect()}
    assert got == {
        1: "home about alpha beta copyright",
        2: "home about gamma copyright",
        3: "home about delta eps copyright",
        4: "home about zeta copyright",
    }
