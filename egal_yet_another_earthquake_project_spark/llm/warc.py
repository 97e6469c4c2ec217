"""WARC container lane: the on-disk format a real pretraining crawl
arrives in (Common Crawl ships WARC/1.0), parsed with the same
discipline as the binary media codecs — exact framing, strict
rejection, analytic oracles.

Reference anchor: none — north-star mandate (the reference ingests a
REST feed; a 100 TB crawl ingests WARC files of HTTP responses).

* ``encode_warc`` writes a spec-shaped WARC/1.0 file: a ``warcinfo``
  record followed by one ``response`` record per page, each framed as
  header block (CRLF lines, ``Content-Length`` exact) + body +
  ``\\r\\n\\r\\n`` record separator, response bodies carrying real
  HTTP/1.1 status lines and headers.
* ``parse_warc`` walks that framing STRICTLY: every record must start
  ``WARC/1.0``, ``Content-Length`` must be present and frame the body
  exactly, the two-CRLF separators must tile the byte length to EOF —
  truncation, sync loss, or a missing header is a ``ValueError``, not
  a silent partial parse (a container that doesn't tile is corruption,
  the same rule as the MP4 box walk). HTTP response records split
  their status line and entity body.
* ``extract_warc_pages`` is the Spark surface: WARC blobs →
  one row per response record (Arrow-batched ``mapInPandas``, no
  shuffle) — compose with ``llm.html.extract_text_from_html`` for the
  full crawl front end: WARC → HTML → text, which is exactly what the
  ``warc_extract`` declared query hash-verifies end to end.

At 100 TB: WARC files are the input splits; both stages are pure map
lanes, so the whole crawl front end runs at scan parallelism with zero
shuffles before the first dedup.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)

_CRLF = b"\r\n"


def encode_warc(pages: list[tuple[str, bytes]]) -> bytes:
    """One WARC/1.0 file: a ``warcinfo`` record + one ``response``
    record per (target_uri, html_bytes) page, deterministic (fixed
    dates/ids derived from position, no randomness — the analytic
    oracle depends on it)."""
    out = []

    def record(headers: list[tuple[str, str]], body: bytes) -> bytes:
        head = [b"WARC/1.0"]
        head += [f"{k}: {v}".encode("utf-8") for k, v in headers]
        head.append(f"Content-Length: {len(body)}".encode())
        return _CRLF.join(head) + _CRLF * 2 + body + _CRLF * 2

    info_body = b"software: egal-spark-crawler/1.0\r\n"
    out.append(
        record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Date", "2026-01-01T00:00:00Z"),
                ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
                ("Content-Type", "application/warc-fields"),
            ],
            info_body,
        )
    )
    for i, (uri, html) in enumerate(pages):
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(html)}".encode()
            + _CRLF * 2
            + html
        )
        out.append(
            record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Date", "2026-01-01T00:00:00Z"),
                    (
                        "WARC-Record-ID",
                        f"<urn:uuid:00000000-0000-0000-0000-{i + 1:012d}>",
                    ),
                    ("WARC-Target-URI", uri),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http,
            )
        )
    return b"".join(out)


def encode_warc_gz(pages: list[tuple[str, bytes]]) -> bytes:
    """:func:`encode_warc` in Common Crawl's ACTUAL on-disk framing:
    each WARC record compressed as its OWN gzip member and the members
    concatenated (the per-record-gzip layout that makes a .warc.gz
    range-seekable per record). Deterministic: fixed-dictionary zlib
    with a zeroed gzip header (no mtime/filename), so the same pages
    always produce the same bytes — the oracle contract every encoder
    in this repo keeps."""
    plain = encode_warc(pages)
    members = []
    pos, n = 0, len(plain)
    while pos < n:
        # each record = header block + body + CRLF*2; recompute the
        # exact extent the strict parser would walk
        head_end = plain.find(_CRLF * 2, pos)
        lines = plain[pos:head_end].split(_CRLF)
        clen = next(
            int(ln.split(b":", 1)[1])
            for ln in lines[1:]
            if ln.lower().startswith(b"content-length:")
        )
        rec_end = head_end + 4 + clen + 4
        rec = plain[pos:rec_end]
        co = zlib.compressobj(9, zlib.DEFLATED, 31)
        members.append(co.compress(rec) + co.flush())
        pos = rec_end
    return b"".join(members)


def _gunzip_members(blob: bytes) -> bytes:
    """Concatenated gzip members → concatenated plain bytes, STRICTLY:
    every byte must belong to a well-formed member (trailing garbage or
    a truncated member is a ``ValueError``, the container-tiling rule)."""
    out = []
    data = bytes(blob)
    while data:
        d = zlib.decompressobj(31)
        try:
            out.append(d.decompress(data))
        except zlib.error as exc:
            raise ValueError(f"parse_warc: bad gzip member: {exc}") from exc
        out.append(d.flush())
        if not d.eof:
            raise ValueError("parse_warc: truncated gzip member")
        data = d.unused_data
    return b"".join(out)


def parse_warc(blob: bytes) -> list[dict]:
    """Strict WARC/1.0 record walk → one dict per record:
    ``{warc_type, target_uri, http_status, content_type, body}``
    (status/content_type/body None for non-HTTP records). Accepts both
    plain WARC and Common Crawl's per-record-gzip ``.warc.gz`` framing
    (multi-member gzip, sniffed by magic — VERDICT r12 #5). Raises
    ``ValueError`` on any framing violation — version marker, missing
    Content-Length, body overrun, separator bytes that do not tile to
    EOF, or a malformed/truncated gzip member."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(blob)
    records = []
    pos, n = 0, len(blob)
    while pos < n:
        head_end = blob.find(_CRLF * 2, pos)
        if head_end < 0:
            raise ValueError("parse_warc: unterminated record header")
        lines = blob[pos:head_end].split(_CRLF)
        if lines[0] != b"WARC/1.0":
            raise ValueError(
                f"parse_warc: bad version marker at offset {pos}"
            )
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if not sep:
                raise ValueError(f"parse_warc: malformed header line {ln!r}")
            headers[k.decode("latin-1").strip().lower()] = (
                v.decode("latin-1").strip()
            )
        if "content-length" not in headers:
            raise ValueError("parse_warc: record missing Content-Length")
        clen = int(headers["content-length"])
        body_start = head_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise ValueError("parse_warc: truncated record body")
        if blob[body_end : body_end + 4] != _CRLF * 2:
            raise ValueError(
                f"parse_warc: record separator missing at offset {body_end}"
            )
        body = blob[body_start:body_end]
        wtype = headers.get("warc-type", "")
        status = None
        entity = None
        ctype = None
        if wtype == "response":
            split = body.find(_CRLF * 2)
            if split < 0 or not body.startswith(b"HTTP/1."):
                raise ValueError("parse_warc: response record without HTTP head")
            status_line = body[: body.find(_CRLF)].decode("latin-1")
            try:
                status = int(status_line.split(" ", 2)[1])
            except (IndexError, ValueError) as exc:
                raise ValueError(
                    f"parse_warc: bad HTTP status line {status_line!r}"
                ) from exc
            entity = body[split + 4 :]
            # when the HTTP head declares an entity length it must match
            # the WARC-framed remainder — a disagreement means one of the
            # two framings lies (the strictness rule of every codec lane)
            for ln in body[:split].split(_CRLF)[1:]:
                k, sep, v = ln.partition(b":")
                if not sep:
                    continue
                hname = k.decode("latin-1").strip().lower()
                if hname == "content-length":
                    if int(v.strip()) != len(entity):
                        raise ValueError(
                            "parse_warc: HTTP Content-Length "
                            f"{int(v.strip())} != entity length {len(entity)}"
                        )
                elif hname == "content-type":
                    ctype = v.decode("latin-1").strip()
        records.append(
            {
                "warc_type": wtype,
                "target_uri": headers.get("warc-target-uri"),
                "http_status": status,
                "content_type": ctype,
                "body": entity,
            }
        )
        pos = body_end + 4
    return records


def extract_warc_pages(
    warcs: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """WARC blobs → one row per HTTP ``response`` record:
    ``(target_uri, http_status, html binary)``. Arrow-batched, no
    shuffle; each blob's records fan out within its input partition.
    Compose with ``llm.html.extract_text_from_html`` for crawl → text."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            uris, statuses, ctypes, bodies = [], [], [], []
            for blob in pdf[payload_col]:
                for rec in parse_warc(bytes(blob)):
                    if rec["warc_type"] != "response":
                        continue
                    uris.append(rec["target_uri"])
                    statuses.append(rec["http_status"])
                    ctypes.append(rec["content_type"])
                    bodies.append(rec["body"])
            yield pd.DataFrame(
                {
                    "target_uri": uris,
                    "http_status": statuses,
                    "content_type": ctypes,
                    "html": bodies,
                }
            )

    return warcs.select(payload_col).mapInPandas(
        run,
        "target_uri string, http_status int, content_type string, "
        "html binary",
    )
