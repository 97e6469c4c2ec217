"""HTML → text extraction lane (llm/html.py, round 12): the parser
must strip real markup (skip subtrees, char refs, comments), the
quality signals must be exact on hand-built pages, malformed markup
must recover instead of raising, and the Spark lane must be a pure
Arrow map stage."""

from __future__ import annotations

from egal_yet_another_earthquake_project_spark.llm.html import (
    extract_text_from_html,
    parse_html,
    render_test_page,
)


def test_parse_strips_boilerplate_and_decodes_entities():
    page = (
        "<html><head><title>T&amp;A</title><script>ignore()</script>"
        "<style>.x{}</style></head><body>"
        "<nav><a href='/'>home link</a></nav>"
        "<p>AT&amp;T &lt;rocks&gt;</p><!-- dropped -->"
        "<noscript>also dropped</noscript>"
        "<p>second para</p><footer>foot</footer></body></html>"
    )
    r = parse_html(page)
    assert r["text"] == "home link AT&T <rocks> second para foot"
    assert r["title"] == "T&A"
    assert r["n_links"] == 1 and r["n_paragraphs"] == 2
    assert r["n_words"] == 7
    # two of seven words sit inside <a>
    assert r["link_density"] == 2 / 7
    assert 0 < r["text_density"] < 1 and r["ok"]


def test_parse_recovers_on_malformed_markup():
    # unclosed tags, stray brackets, nested misuse — crawls are full of
    # this; the lane must yield a row, never raise
    r = parse_html("<p>one <b>two <p>three</i> four < five")
    assert "one" in r["text"] and "four" in r["text"]
    assert r["ok"]


def test_parse_flags_undecodable_bytes():
    # \x80\x81 are bare continuation bytes — invalid UTF-8, no BOM
    r = parse_html(b"\x80\x81<p>x</p>")
    assert r["ok"] is False and r["reason"] == "undeclared-not-utf8"
    assert r["n_paragraphs"] == 1  # latin-1 fallback still parses


def test_parse_honors_declared_charsets_with_fallback_accounting():
    """VERDICT r12 #5: <meta charset> and HTTP Content-Type charsets
    are honored (BOM > HTTP > meta precedence); any departure from the
    declared/default decode path flags ok=False with a named reason."""
    turkish = "a\u011fr\u0131 da\u011f\u0131"  # ağrı dağı
    meta_page = (
        '<html><head><meta charset="iso-8859-9"></head><body><p>'
        + turkish
        + "</p></body></html>"
    ).encode("iso-8859-9")
    r = parse_html(meta_page)
    assert r["ok"] and r["reason"] == "" and r["text"] == turkish

    # HTTP header beats meta (WHATWG precedence below the BOM)
    lying_meta = (
        '<html><meta charset="utf-8"><p>' + turkish + "</p></html>"
    ).encode("iso-8859-9")
    r = parse_html(lying_meta, content_type="text/html; charset=iso-8859-9")
    assert r["ok"] and r["text"] == turkish

    # a BOM beats everything (utf-8-sig prepends the BOM itself)
    bom_page = ("<p>" + turkish + "</p>").encode("utf-8-sig")
    r = parse_html(bom_page, content_type="text/html; charset=iso-8859-9")
    assert r["ok"] and r["text"] == turkish

    # lying declaration: meta says utf-8, bytes are not — fallback
    # accounted, row still produced
    r = parse_html(lying_meta)
    assert r["ok"] is False
    assert r["reason"] == "charset-decode-failed:utf-8"

    # unknown codec name: accounted, utf-8 attempt still lands
    r = parse_html(b'<meta charset="bogus-enc"><p>hi</p>')
    assert r["ok"] is False
    assert r["reason"] == "unknown-charset:bogus-enc"
    assert "hi" in r["text"]


def test_script_cdata_semantics_match_browsers():
    # HTML5: <script> content is CDATA — everything to the FIRST
    # </script> is script text (script elements cannot nest), so "a" and
    # the inner "<script>b" are dropped, "c" is body content, and the
    # stray trailing </script> is ignored. The stdlib parser implements
    # exactly this, which is what a crawl extractor must match.
    r = parse_html("<script>a<script>b</script>c</script><p>kept</p>")
    assert r["text"] == "c kept"
    # and a style/noscript pair nested in EACH OTHER still never leaks
    r2 = parse_html("<noscript><style>.x{}</style>hidden</noscript><p>v</p>")
    assert r2["text"] == "v"


def test_spark_lane_round_trips_rendered_pages(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, ""),
        (3, "x " * 23),
    ]
    pages = spark.createDataFrame(
        [(i, render_test_page(i, t)) for i, t in rows],
        "doc_id long, html string",
    )
    got = {r.doc_id: r for r in extract_text_from_html(pages).collect()}
    assert got[1].text == "home about alpha beta gamma copyright"
    assert got[2].text == "home about copyright"
    assert got[2].n_paragraphs == 0 and got[2].n_words == 3
    assert got[3].n_paragraphs == 3 and got[3].n_words == 26
    assert all(r.title == f"Doc {i}" for i, r in got.items())
    assert all(r.n_links == 2 and r.ok for r in got.values())
    # pure map lane: no exchange in the plan
    plan = extract_text_from_html(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_canonical_url_unifies_duplicate_fetches(spark):
    """Two fetches of the same resource differing only in case, default
    port, fragment, tracking params, and query order must canonicalize
    to the SAME key — and the expression must stay a pure map (no
    exchange, no Python UDF)."""
    from egal_yet_another_earthquake_project_spark.functions import (
        canonical_url,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "HTTP://News.Example.COM:80/a//b?utm_source=x&q=spark&page=2#top"),
            (2, "http://news.example.com/a/b?page=2&q=spark"),
            (3, "http://news.example.com/a/b?page=3&q=spark"),  # different page
        ],
        "id long, url string",
    )
    out = df.withColumn("canon", canonical_url("url"))
    canon = {r.id: r.canon for r in out.collect()}
    assert canon[1] == canon[2] == "http://news.example.com/a/b?page=2&q=spark"
    assert canon[3] != canon[1]  # content-addressing params survive
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_null_html_yields_flagged_empty_row(spark):
    # a crawl frame with a null body must produce an ok=false row, not
    # a task failure
    from egal_yet_another_earthquake_project_spark.llm.html import (
        extract_text_from_html,
        parse_html,
    )

    r = parse_html(None)
    assert r["ok"] is False and r["text"] == "" and r["n_words"] == 0
    pages = spark.createDataFrame(
        [(1, "<p>x</p>"), (2, None)], "doc_id long, html string"
    )
    got = {r.doc_id: r for r in extract_text_from_html(pages).collect()}
    assert got[1].text == "x" and got[1].ok
    assert got[2].ok is False and got[2].text == ""
