"""HTML → text extraction: the stage every crawl-derived training
pipeline runs FIRST (CCNet / RefinedWeb / Gopher all begin at
WARC-HTML → main text), re-expressed for Spark.

Reference anchor: none — north-star mandate (the reference ingests an
already-structured REST feed; a 100 TB pretraining crawl ingests HTML).

Design, same rules as the media codec lanes:

* the parser is REAL and stdlib-only (``html.parser.HTMLParser``):
  script/style/noscript/template subtrees and comments are dropped,
  character references decode, text nodes collect in document order
  and whitespace-normalize to single spaces — the tag-stripping
  contract of production extractors;
* the Spark surface is an Arrow-batched ``mapInPandas`` lane —
  embarrassingly parallel, zero shuffle, schema declared up front —
  because per-row markup parsing is exactly the "genuinely can't
  express in built-ins" case the escape hatch exists for;
* quality SIGNALS ride along (title, link count, paragraph count,
  text/html density, link-text density) so downstream gates
  (``operators/quality.py``, the Gopher flags) can filter
  boilerplate-heavy pages without re-parsing;
* strictness: ``parse_html`` never raises on malformed markup (real
  crawls are full of it — the parser is recovering by design, unlike
  the binary codecs where truncation means corruption), but the
  ``ok`` flag goes false when the byte stream is not decodable text.

The declared query (``html_extract``) builds deterministic pages from
the documents table (escaped text in 10-word ``<p>`` paragraphs inside
a nav/footer boilerplate frame) and hash-verifies the EXTRACTED TEXT
itself via md5 against a SQL replay — a bit-exact oracle for a parser
lane, the JPEG integer-grid idea applied to markup.
"""

from __future__ import annotations

import html as _htmllib
from html.parser import HTMLParser
from typing import Iterator

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: subtrees whose text is never content
_SKIP_TAGS = {"script", "style", "noscript", "template"}
#: output columns appended after the caller's id column
_EXTRACT_FIELDS = (
    "text string, title string, n_links int, "
    "n_paragraphs int, n_words int, html_chars int, text_chars int, "
    "text_density double, link_density double, ok boolean, reason string"
)

#: <meta charset="..."> / <meta http-equiv=Content-Type content="...;
#: charset=..."> in the first KiB, matched on the ascii-safe prefix —
#: the WHATWG prescan, minus the byte-level tokenizer
_META_CHARSET_RE = _re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_.:-]+)""",
    _re.IGNORECASE,
)


def sniff_charset(raw: bytes, content_type: str | None = None) -> tuple[str | None, str]:
    """(codec, source) for an HTML byte payload, WHATWG precedence:
    BOM > HTTP Content-Type charset > ``<meta charset>`` prescan of the
    first 1024 bytes > none. The codec is returned as declared (not
    validated) — the caller attempts the decode and accounts for
    failures (VERDICT r12 #5: strict fallback accounting)."""
    if raw[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "bom"
    if raw[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16", "bom"
    if content_type:
        m = _re.search(r"charset\s*=\s*[\"']?\s*([a-zA-Z0-9_.:-]+)", content_type, _re.IGNORECASE)
        if m:
            return m.group(1).lower(), "http"
    m = _META_CHARSET_RE.search(raw[:1024])
    if m:
        return m.group(1).decode("ascii", "replace").lower(), "meta"
    return None, "none"


class _Extractor(HTMLParser):
    """Single-pass tag stripper with the quality counters inline."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.words: list[str] = []
        self.title_words: list[str] = []
        self.link_words = 0
        self.n_links = 0
        self.n_paragraphs = 0
        self._skip_depth = 0
        self._in_title = False
        self._link_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "a":
            self.n_links += 1
            self._link_depth += 1
        elif tag == "p":
            self.n_paragraphs += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False
        elif tag == "a" and self._link_depth:
            self._link_depth -= 1

    def handle_data(self, data):
        if self._skip_depth:
            return
        ws = data.split()
        if self._in_title:
            self.title_words.extend(ws)
            return
        self.words.extend(ws)
        if self._link_depth:
            self.link_words += len(ws)


def parse_html(markup: str | bytes, content_type: str | None = None) -> dict:
    """Extract main text + quality signals from one HTML document.

    Never raises on malformed markup (the stdlib parser recovers).
    Byte payloads are decoded per the sniffed charset
    (:func:`sniff_charset`: BOM > HTTP ``content_type`` charset >
    ``<meta charset>`` prescan > utf-8 default — VERDICT r12 #5), with
    STRICT fallback accounting: any departure from the declared/default
    path sets ``ok`` False and names itself in ``reason``
    (``null-body``, ``unknown-charset:<cs>``,
    ``charset-decode-failed:<cs>``, ``undeclared-not-utf8``) while
    still yielding a row — a crawl frame must drop bad pages through
    the quality gates, never kill the task."""
    ok, reason = True, ""
    if markup is None:
        markup, ok, reason = "", False, "null-body"
    if isinstance(markup, (bytes, bytearray)):
        raw = bytes(markup)
        codec, source = sniff_charset(raw, content_type)
        markup = None
        if codec is not None:
            try:
                markup = raw.decode(codec)
            except LookupError:
                ok, reason = False, f"unknown-charset:{codec}"
            except UnicodeDecodeError:
                ok, reason = False, f"charset-decode-failed:{codec}"
        if markup is None:
            try:
                markup = raw.decode("utf-8")
                if codec is None:
                    pass  # undeclared but clean utf-8 — the happy default
            except UnicodeDecodeError:
                markup = raw.decode("latin-1")
                if ok:
                    ok, reason = False, "undeclared-not-utf8"
    p = _Extractor()
    p.feed(markup)
    p.close()
    text = " ".join(p.words)
    html_chars = len(markup)
    text_chars = len(text)
    return {
        "text": text,
        "title": " ".join(p.title_words),
        "n_links": p.n_links,
        "n_paragraphs": p.n_paragraphs,
        "n_words": len(p.words),
        "html_chars": html_chars,
        "text_chars": text_chars,
        "text_density": (text_chars / html_chars) if html_chars else 0.0,
        "link_density": (p.link_words / len(p.words)) if p.words else 0.0,
        "ok": ok,
        "reason": reason,
    }


def extract_text_from_html(
    pages: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    content_type_col: str | None = None,
) -> DataFrame:
    """(id, text, title, …signals) for a frame of raw HTML pages —
    Arrow-batched ``mapInPandas``, one Python pass per page, no
    shuffle: at 100 TB this is a pure map stage whose parallelism is
    the input split count, like the media decode lanes. The id column
    keeps the caller's name AND type (a doc_id long, a crawl URL
    string — both are real keys for this stage)."""
    import pandas as pd

    id_field = pages.schema[id_col]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, {_EXTRACT_FIELDS}"
    )
    out_cols = [id_col] + [
        f.split()[0] for f in _EXTRACT_FIELDS.split(", ")
    ]
    id_out, html_in, ct_in = id_col, html_col, content_type_col

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=out_cols)
                continue
            if ct_in is not None:
                cts = [
                    None if c is None or (isinstance(c, float)) else str(c)
                    for c in pdf[ct_in]
                ]
            else:
                cts = [None] * len(pdf)
            rows = [
                parse_html(m, content_type=c)
                for m, c in zip(pdf[html_in], cts)
            ]
            out = pd.DataFrame(rows)
            out.insert(0, id_out, pdf[id_out].values)
            yield out

    sel = [F.col(id_col), F.col(html_col)]
    if content_type_col is not None:
        sel.append(F.col(content_type_col))
    return pages.select(*sel).mapInPandas(run, schema)


def render_test_page(doc_id: int, text: str, words_per_para: int = 10) -> str:
    """Deterministic page builder for the oracle-paired query and the
    tests: the document text (HTML-escaped, so extraction must decode
    entities to round-trip) in ``words_per_para``-word ``<p>`` blocks,
    inside a title/nav/script/footer boilerplate frame. Extraction of
    this page is EXACTLY ``"home about " + norm(text) + " copyright"``
    (norm = whitespace-collapsed), which is what the SQL oracle
    replays."""
    words = text.split()
    paras = [
        "<p>"
        + _htmllib.escape(" ".join(words[i : i + words_per_para]))
        + "</p>"
        for i in range(0, len(words), words_per_para)
    ]
    return (
        f"<html><head><title>Doc {doc_id}</title>"
        "<script>var x = 1 < 2;</script>"
        '<style>p { color: red; }</style></head>'
        '<body><nav><a href="/">home</a> <a href="/about">about</a></nav>'
        + "".join(paras)
        + "<!-- comment stripped --><footer>copyright</footer></body></html>"
    )
