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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: subtrees whose text is never content
_SKIP_TAGS = {"script", "style", "noscript", "template"}
#: elements that terminate a paragraph run
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "section",
    "article", "header", "footer", "nav", "blockquote", "pre",
    "h1", "h2", "h3", "h4", "h5", "h6",
}

#: output columns appended after the caller's id column
_EXTRACT_FIELDS = (
    "text string, title string, n_links int, "
    "n_paragraphs int, n_words int, html_chars int, text_chars int, "
    "text_density double, link_density double, ok boolean"
)


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


def parse_html(markup: str | bytes) -> dict:
    """Extract main text + quality signals from one HTML document.

    Never raises on malformed markup (the stdlib parser recovers);
    ``ok`` is False only when the input is null or the bytes are not
    decodable UTF-8 (with the usual latin-1 last-resort, so binary
    garbage still yields a row the quality gates can drop on
    density) — a crawl frame with a null body must not kill the
    task."""
    ok = True
    if markup is None:
        markup, ok = "", False
    if isinstance(markup, (bytes, bytearray)):
        try:
            markup = bytes(markup).decode("utf-8")
        except UnicodeDecodeError:
            markup = bytes(markup).decode("latin-1")
            ok = False
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
    }


def extract_text_from_html(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
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
    id_out, html_in = id_col, html_col

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=out_cols)
                continue
            rows = [parse_html(m) for m in pdf[html_in]]
            out = pd.DataFrame(rows)
            out.insert(0, id_out, pdf[id_out].values)
            yield out

    return pages.select(F.col(id_col), F.col(html_col)).mapInPandas(
        run, schema
    )


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
