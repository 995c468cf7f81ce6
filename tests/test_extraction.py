"""Extraction golden tests: HTML → links/media/metadata/markdown/spans.

The fixture page exercises the behaviors the reference extractor pins:
metadata incl. og: fallback, link de-dup by raw href, internal vs
external split, media (src / data-src / srcset) in document order,
interleaved text+media spans, and citation conversion
(markdown_generation_strategy.py:82-146 semantics).
"""

from __future__ import annotations

from crawl4ai_spark.extraction.htmlparse import extract_page
from crawl4ai_spark.extraction.markdown import convert_links_to_citations
from crawl4ai_spark.extraction.udfs import extract_one

PAGE_URL = "https://h1.example.test/docs/intro"

HTML = """<!DOCTYPE html>
<html><head>
<title>Intro &amp; Basics</title>
<meta name="description" content="A test page">
<meta name="keywords" content="spark,crawl">
<meta property="og:title" content="OG Intro">
<script>var x = "<p>not content</p>";</script>
<style>.x { color: red }</style>
</head>
<body>
<h1>Welcome</h1>
<p>First paragraph with <strong>bold</strong> and <em>italic</em> and
a <a href="/docs/next">next page</a> link.</p>
<img src="/img/hero.png" alt="Hero" width="800" height="400">
<p>Second paragraph linking <a href="https://other.example.org/x">elsewhere</a>
and repeating <a href="/docs/next">next page</a>.</p>
<ul><li>alpha</li><li>beta <code>c()</code></li></ul>
<video src="/media/clip.mp4"></video>
<table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table>
<blockquote><p>quoted text</p></blockquote>
<pre>code block
line2</pre>
<img data-src="/img/lazy.jpg" alt="">
<audio><source src="/media/pod.ogg"></audio>
<p>Tail paragraph.</p>
</body></html>"""


def test_metadata():
    page = extract_page(PAGE_URL, HTML)
    assert page.metadata["title"] == "Intro & Basics"
    assert page.metadata["description"] == "A test page"
    assert page.metadata["keywords"] == "spark,crawl"
    assert page.metadata["og:title"] == "OG Intro"


def test_og_title_fallback():
    page = extract_page(PAGE_URL, "<head><meta property='og:title' content='Only OG'></head>")
    assert page.metadata["title"] == "Only OG"


def test_links_dedup_and_split():
    page = extract_page(PAGE_URL, HTML)
    hrefs = [l.href for l in page.links]
    # raw hrefs, de-duplicated by first occurrence
    assert hrefs == ["/docs/next", "https://other.example.org/x"]
    internal = {l.href: l.internal for l in page.links}
    assert internal["/docs/next"] is True
    assert internal["https://other.example.org/x"] is False
    assert page.links[0].text == "next page"


def test_media_document_order():
    page = extract_page(PAGE_URL, HTML)
    srcs = [(m.src, m.media_type) for m in page.media]
    assert srcs == [
        ("/img/hero.png", "image"),
        ("/media/clip.mp4", "video"),
        ("/img/lazy.jpg", "image"),
        ("/media/pod.ogg", "audio"),
    ]
    assert [m.group_id for m in page.media] == [0, 1, 2, 3]
    # hero: width>150 +1, alt +1, non-data +1, .png +1 = 4
    assert page.media[0].score == 4


def test_span_interleaving():
    page = extract_page(PAGE_URL, HTML)
    kinds = [(k, r) for (k, t, r, o) in page.spans]
    # text spans around each media span, in document order
    seq = [r if k == "media" else "T" for (k, r) in kinds]
    assert seq == [
        "T",                # h1
        "T",                # first paragraph
        "/img/hero.png",
        "T",                # second paragraph
        "T", "T",           # two list items
        "/media/clip.mp4",
        "T",                # table
        "T",                # blockquote
        "T",                # pre
        "/img/lazy.jpg",
        "/media/pod.ogg",
        "T",                # tail paragraph
    ]
    assert [o for (_, _, _, o) in page.spans] == list(range(len(page.spans)))


def test_markdown_blocks():
    page = extract_page(PAGE_URL, HTML)
    texts = [b.text for b in page.blocks if b.kind == "text"]
    assert texts[0] == "# Welcome"
    assert "**bold**" in texts[1] and "*italic*" in texts[1]
    assert "[next page](/docs/next)" in texts[1]
    assert texts[3] == "- alpha"
    assert texts[4] == "- beta `c()`"
    assert texts[5].startswith("| k | v |")
    assert texts[6] == "> quoted text"
    assert texts[7] == "```\ncode block\nline2\n```"
    # script/style content never leaks
    assert all("not content" not in t and "color: red" not in t for t in texts)


def test_citations():
    md = "See [next page](/docs/next) and [other](https://o.org/x) and [next page](/docs/next)."
    cited, refs = convert_links_to_citations(md, PAGE_URL)
    assert cited == "See next page⟨1⟩ and other⟨2⟩ and next page⟨3⟩."\
        .replace("next page⟨3⟩", "next page⟨1⟩")  # same URL → same number
    # leading-slash join is the reference's string-concat fast path
    # (fast_urljoin:19-23), pinned byte-exactly by test_citations_golden
    assert "⟨1⟩ https://h1.example.test/docs/intro/docs/next: next page" in refs
    assert "⟨2⟩ https://o.org/x: other" in refs


def test_image_citation():
    md = "![Hero](/img/hero.png)"
    cited, refs = convert_links_to_citations(md, PAGE_URL)
    assert cited == "![Hero⟨1⟩]"
    assert "⟨1⟩ https://h1.example.test/docs/intro/img/hero.png: Hero" in refs


def test_extract_one_contract():
    row = extract_one(PAGE_URL, HTML)
    assert row["success"] is True
    assert row["spans"][0]["kind"] == "text"
    assert row["raw_markdown"].startswith("# Welcome")
    assert "⟨" in row["markdown_with_citations"]
    assert row["references_markdown"].startswith("\n\n## References")
    bad = extract_one(PAGE_URL, None)
    assert bad["success"] is False and bad["spans"] == []


def test_extract_udf_spark(spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.extraction.udfs import extract_udf

    df = spark.createDataFrame([(PAGE_URL, HTML)], ["url", "html"])
    out = df.select("url", extract_udf("url", "html").alias("ex")).select(
        "url", "ex.success", "ex.spans", F.size("ex.links").alias("n_links")
    ).collect()[0]
    assert out["success"] is True
    assert out["n_links"] == 2
    py = extract_one(PAGE_URL, HTML)
    got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in out["spans"]]
    exp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in py["spans"]]
    assert got == exp  # Spark UDF ≡ pure-Python extractor, span-for-span
