"""BM25 content filter (E6) + fit_html preprocess (E8) — reference
semantics: query fallback chain, per-page BM25 with tag weighting,
document-order cleaned output, schema-preprocessing truncation
(content_filter_strategy.py:381-530, utils.py:2883-2980)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.extraction.fit import (
    bm25_filter_chunks,
    fit_html_preprocess,
    make_bm25_fit_udf,
    page_query,
    text_chunks,
)
from crawl4ai_spark.extraction.htmlparse import parse_html

HTML = """
<html><head><title>Spark crawling guide</title>
<meta name="description" content="Distributed crawling with Spark frontier tables"/>
</head><body>
<h1>Crawling with Spark</h1>
<p>This paragraph explains distributed crawling using Spark frontier
tables and politeness budgets in reasonable depth for readers.</p>
<p>Unrelated text about cooking pasta and tomato sauce recipes.</p>
<ul><li>Frontier crawling partitions scale with Spark executors</li>
<li>buy socks</li></ul>
<aside class="x" onclick="evil()">side note about spark crawling</aside>
</body></html>
"""


def test_page_query_fallbacks():
    q = page_query(parse_html(HTML))
    assert "Spark crawling guide" in q          # title
    assert "Crawling with Spark" in q           # first h1
    assert "frontier tables" in q               # meta description
    # no metadata → first long paragraph
    bare = "<body><p>short</p><p>%s</p></body>" % ("crawl " * 40)
    q2 = page_query(parse_html(bare))
    assert q2.startswith("crawl crawl")
    assert page_query(parse_html("<body></body>")) == ""
    assert page_query(parse_html(HTML), user_query="override") == "override"


def test_text_chunks_document_order():
    chunks = text_chunks(parse_html(HTML))
    tags = [t for _, _, t, _ in chunks]
    assert tags[:3] == ["h1", "p", "p"]
    assert "li" in tags
    idxs = [i for i, _, _, _ in chunks]
    assert idxs == sorted(idxs)


def test_bm25_filter_keeps_relevant_drops_noise():
    kept = bm25_filter_chunks(HTML, threshold=0.5)
    # The reference serializes cleaned chunk elements with their text
    # AS-IS (raw source newlines preserved) — normalize whitespace
    # only for the containment assertions.
    joined = " ".join(" ".join(c.split()) for c in kept)
    assert "Crawling with Spark" in joined
    assert "frontier tables" in joined
    assert "tomato sauce" not in joined
    assert "buy socks" not in joined


def test_bm25_filter_edge_cases():
    assert bm25_filter_chunks("", threshold=0.5) == []
    assert bm25_filter_chunks("<body><div></div></body>") == []
    # no query derivable → [] (reference returns [] on empty query)
    assert bm25_filter_chunks("<body><p>tiny</p></body>") == []


def test_clean_element_strips_unwanted_attrs():
    html = '<body><h1>spark spark spark</h1><p class="c" onclick="x()" style="s">spark crawling text</p></body>'
    kept = bm25_filter_chunks(html, user_query="spark crawling", threshold=0.1)
    assert any("<p>" in c for c in kept)
    assert not any("onclick" in c or "class=" in c for c in kept)


def test_fit_html_preprocess():
    html = ("<html><head><title>x</title></head><body>"
            "<p>" + "a" * 150 + "</p>"
            '<a href="' + "u" * 300 + '">link</a>'
            "<svg>vector</svg><script>j()</script></body></html>")
    out = fit_html_preprocess(html)
    assert "<head>" not in out and "svg" not in out and "script" not in out
    assert "a" * 100 + "..." in out            # text truncated at 100
    assert "u" * 200 + "..." in out            # attr truncated at 200
    assert fit_html_preprocess("") == ""
    assert len(fit_html_preprocess("<p>" + "x" * 500_000 + "</p>", max_size=1000)) <= 1000


def test_bm25_fit_udf(spark):
    udf = make_bm25_fit_udf(threshold=0.5)
    df = spark.createDataFrame([("u1", HTML), ("u2", "")], "url string, html string")
    rows = {r["url"]: r["f"] for r in df.select("url", udf("url", "html").alias("f")).collect()}
    assert "Crawling with Spark" in rows["u1"]["fit_html"]
    assert rows["u1"]["fit_markdown"].startswith("# Crawling with Spark")
    assert rows["u2"]["fit_html"] == "" and rows["u2"]["fit_markdown"] == ""
