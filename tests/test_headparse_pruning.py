"""Tests for head parsing (E15) and the pruning content filter (E5)."""

from __future__ import annotations

from crawl4ai_spark.extraction.headparse import (
    head_text_for_scoring, parse_head_py, truncate_to_head,
)
from crawl4ai_spark.extraction.pruning import fit_spans, score_element
from crawl4ai_spark.extraction.htmlparse import parse_html

HEAD_HTML = """<!DOCTYPE html><html lang="en"><head>
<title>Deep Dive</title>
<meta name="description" content="All about shuffles">
<meta property="og:title" content="OG Deep Dive">
<link rel="canonical" href="https://h.test/deep">
<script type="application/ld+json">{"@type": "Article"}</script>
</head><body><p>body text should not leak</p></body></html>"""


def test_parse_head():
    d = parse_head_py(HEAD_HTML)
    assert d["title"] == "Deep Dive"
    assert d["lang"] == "en"
    assert d["meta"]["description"] == "All about shuffles"
    assert d["link_rels"]["canonical"] == "https://h.test/deep"
    assert d["jsonld"] == ['{"@type": "Article"}']


def test_truncate_to_head():
    assert truncate_to_head(HEAD_HTML).endswith("</head>")
    assert "body text" not in truncate_to_head(HEAD_HTML)


def test_og_title_fallback_head():
    d = parse_head_py('<head><meta property="og:title" content="Only OG"></head>')
    assert d["title"] == "Only OG"


def test_head_text_weighting():
    d = parse_head_py(HEAD_HTML)
    t = head_text_for_scoring(d)
    assert t.count("Deep Dive") == 3
    assert t.count("All about shuffles") == 2


PAGE = """<html><body>
<nav class="nav-menu"><a href="/">home</a><a href="/x">x</a><a href="/y">y</a></nav>
<article class="main-content">
<h1>Real Title</h1>
<p>This is a long meaningful paragraph about distributed crawling with many
words of genuine content that should clearly survive any boilerplate pruning
pass because it is dense informative text without links.</p>
<p>Another substantial paragraph continues the discussion of partitioned
frontiers and politeness budgets across many executor nodes in detail.</p>
</article>
<footer class="footer"><a href="/tos">tos</a> <a href="/priv">privacy</a></footer>
</body></html>"""


def test_prune_drops_boilerplate_keeps_content():
    spans, md = fit_spans("https://h.test/p", PAGE)
    assert "Real Title" in md
    assert "meaningful paragraph" in md
    assert "tos" not in md           # footer pruned (link-only, bad class)
    assert "home" not in md          # nav pruned
    texts = [t for (k, t, _r, _o) in spans if k == "text"]
    assert any(t.startswith("# Real Title") for t in texts)


def test_score_ordering():
    root = parse_html(PAGE)
    body = next(root.find_all("body"))
    by_tag = {c.tag: c for c in body.children if c.tag != "#text"}
    assert score_element(by_tag["article"]) > score_element(by_tag["nav"])
    assert score_element(by_tag["article"]) > score_element(by_tag["footer"])
