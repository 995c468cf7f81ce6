"""Tests for the extended operator surface: regex extraction (E12),
chunking (E10), structured tables (E9), BM25 (A8/F6), sitemap seeding
(S3), adaptive stopping metrics (A6/A7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.extraction import chunking as CH
from crawl4ai_spark.extraction import regex_extract as RX
from crawl4ai_spark.extraction import tables as TB
from crawl4ai_spark.functions import bm25 as BM
from crawl4ai_spark.operators import adaptive as AD
from crawl4ai_spark.sources import sitemap as SM


# ── E12 regex extraction ──────────────────────────────────────────────

RX_TEXT = ("Contact bob@example.com or visit https://ex.org/x. "
           "IP 10.0.0.1, 50% off for $19.99, date 2024-03-05, "
           "color #ff00aa, handle @spark_dev, tag #bigdata")


def test_regex_extract_native(spark):
    df = spark.createDataFrame([(1, RX_TEXT)], "doc_id long, text string")
    out = RX.regex_extract(df, labels=["email", "url", "ipv4", "percentage",
                                       "currency", "date_iso", "html_color_hex",
                                       "twitter_handle", "hashtag"])
    got = {(r["label"], r["value"]) for r in out.collect()}
    assert ("email", "bob@example.com") in got
    assert ("ipv4", "10.0.0.1") in got
    assert ("percentage", "50%") in got
    assert ("currency", "$19.99") in got
    assert ("date_iso", "2024-03-05") in got
    assert ("html_color_hex", "#ff00aa") in got
    assert ("twitter_handle", "@spark_dev") in got
    assert any(l == "url" and v.startswith("https://ex.org/x") for l, v in got)


def test_regex_extract_with_spans(spark):
    df = spark.createDataFrame([(1, RX_TEXT)], "doc_id long, text string")
    rows = RX.regex_extract_with_spans(df, labels=["email"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert RX_TEXT[r["start"]:r["end"]] == "bob@example.com"


# ── E10 chunking ──────────────────────────────────────────────────────

def test_regex_chunks(spark):
    df = spark.createDataFrame([("a b\n\nc d\n\n\n\n e",)], "text string")
    out = df.select(CH.regex_chunks("text").alias("c")).collect()[0]["c"]
    assert [x.strip() for x in out] == ["a b", "c d", "e"]


def test_window_chunks_overlap(spark):
    words = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame([(words,)], "text string")
    chunks = df.select(CH.window_chunks("text", 10, 2).alias("c")).collect()[0]["c"]
    # stride 8: [0..9], [8..17], [16..24]
    assert len(chunks) == 3
    assert chunks[0].split()[:2] == ["w0", "w1"]
    assert chunks[1].split()[0] == "w8"
    assert chunks[2].split()[0] == "w16"
    assert chunks[2].split()[-1] == "w24"


def test_merge_small_chunks(spark):
    rows = [(1, 0, "a b c d e"), (1, 1, "x"), (1, 2, "p q r s t"), (2, 0, "z")]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, chunk string")
    merged = CH.merge_small_chunks(df, min_tokens=3).orderBy("doc_id", "chunk_idx").collect()
    texts = [(r["doc_id"], r["chunk"]) for r in merged]
    # chunk 1 ('x') follows a big chunk → starts new group, but is small
    # → next big chunk does NOT merge into it…; semantics: group breaks
    # after any chunk that met the threshold
    assert (1, "a b c d e") in texts
    assert any(d == 1 and c.startswith("x") for d, c in texts)
    assert (2, "z") in texts


# ── E9 structured tables ──────────────────────────────────────────────

TABLE_HTML = """
<html><body>
<table>
  <caption>Stats</caption>
  <tr><th>name</th><th>value</th></tr>
  <tr><td>alpha</td><td>1</td></tr>
  <tr><td>beta</td><td>2</td></tr>
</table>
<table><tr><td>lonely</td></tr></table>
</body></html>"""


def test_extract_tables_py():
    tables = TB.extract_tables_py(TABLE_HTML)
    assert len(tables) == 1      # the 1-cell table scores below threshold
    t = tables[0]
    assert t["caption"] == "Stats"
    assert t["headers"] == ["name", "value"]
    assert t["rows"] == [["alpha", "1"], ["beta", "2"]]


def test_tables_from_pages(spark):
    df = spark.createDataFrame([("u1", TABLE_HTML)], "url string, html string")
    out = TB.tables_from_pages(df).collect()
    assert len(out) == 1
    assert out[0]["headers"] == ["name", "value"]
    assert out[0]["rows"][1] == ["beta", "2"]


# ── A8 BM25 ──────────────────────────────────────────────────────────

def test_bm25_ranks_relevant_docs(spark):
    rows = [
        (1, "spark query engine with distributed shuffle and spark sql"),
        (2, "cooking recipes for pasta and tomato sauce dinner"),
        (3, "the spark scheduler assigns tasks to executors"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scored = BM.bm25_scores(df, "spark shuffle")
    s = {r["doc_id"]: r["bm25"] for r in scored.collect()}
    assert s[1] > s[3] > s[2] == 0.0
    normed = BM.bm25_minmax(scored)
    n = {r["doc_id"]: r["bm25_norm"] for r in normed.collect()}
    assert n[1] == pytest.approx(1.0) and n[2] == pytest.approx(0.0)


# ── S3 sitemap seeding ────────────────────────────────────────────────

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://h.test/sitemap-a.xml</loc></sitemap>
  <sitemap><loc>https://h.test/sitemap-b.xml</loc></sitemap>
</sitemapindex>"""
SITEMAP_A = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.test/docs/alpha</loc></url>
  <url><loc>https://h.test/robots.txt</loc></url>
</urlset>"""
SITEMAP_B = """<urlset>
  <url><loc>https://h.test/blog/beta-post</loc></url>
</urlset>"""


def test_parse_sitemap_py():
    idx = SM.parse_sitemap_py(SITEMAP_INDEX)
    assert [(e["loc"], e["kind"]) for e in idx] == [
        ("https://h.test/sitemap-a.xml", "sitemap"),
        ("https://h.test/sitemap-b.xml", "sitemap"),
    ]
    urls = SM.parse_sitemap_py(SITEMAP_B)
    assert urls == [{"loc": "https://h.test/blog/beta-post", "kind": "url"}]
    assert SM.parse_sitemap_py("not xml <<<") == []


def test_seed_pipeline(spark):
    sitemaps = spark.createDataFrame(
        [("https://h.test/sitemap.xml", SITEMAP_INDEX),
         ("https://h.test/sitemap-a.xml", SITEMAP_A),
         ("https://h.test/sitemap-b.xml", SITEMAP_B)],
        "url string, xml string",
    )
    out = SM.seed_urls_pipeline(spark, sitemaps, ["https://h.test/sitemap.xml"])
    urls = {r["url"] for r in out.collect()}
    # robots.txt dropped by the nonsense filter; both content URLs kept
    assert urls == {"https://h.test/docs/alpha", "https://h.test/blog/beta-post"}


def test_seed_pipeline_bm25(spark):
    sitemaps = spark.createDataFrame(
        [("https://h.test/sitemap-a.xml", SITEMAP_A),
         ("https://h.test/sitemap-b.xml", SITEMAP_B)],
        "url string, xml string",
    )
    heads = spark.createDataFrame(
        [("https://h.test/docs/alpha", "spark tuning guide for shuffle"),
         ("https://h.test/blog/beta-post", "pasta recipes")],
        "url string, head_text string",
    )
    out = SM.seed_urls_pipeline(
        spark, sitemaps,
        ["https://h.test/sitemap-a.xml", "https://h.test/sitemap-b.xml"],
        query="spark shuffle", head_texts=heads,
    ).collect()
    assert out[0]["url"] == "https://h.test/docs/alpha"
    assert out[0]["relevance_score"] > out[1]["relevance_score"]


def test_paced_probe_schedule(spark):
    """P4 seeder pacing: per-window admission never exceeds the
    hits_per_sec × window budget, windows follow producer order, and
    every candidate is scheduled exactly once (async_url_seeder.py
    rate-semaphore + bounded-queue semantics)."""
    n = 103
    urls = spark.createDataFrame(
        [(f"https://h.test/p{i:04d}",) for i in range(n)], "url string"
    )
    out = SM.paced_probe_schedule(
        urls, hits_per_sec=10, window_sec=1.0, queue_size=25
    )
    rows = sorted(out.collect(), key=lambda r: r["url"])
    # budget pinned: every window admits <=10, all-but-last exactly 10
    from collections import Counter

    per_window = Counter(r["probe_window"] for r in rows)
    assert max(per_window.values()) <= 10
    assert sorted(per_window) == list(range(11))  # 103 urls / 10 per sec
    assert all(per_window[w] == 10 for w in range(10)) and per_window[10] == 3
    # producer order: window index is monotone in url (producer) order
    assert [r["probe_window"] for r in rows] == sorted(
        r["probe_window"] for r in rows
    )
    # bounded queue: in-flight rows within one lookahead queue never
    # exceed 2 * queue_size
    per_queue = Counter(r["queue_window"] for r in rows)
    assert max(per_queue.values()) <= 25
    # disabled pacing (reference: non-positive hits_per_sec)
    off = SM.paced_probe_schedule(urls, hits_per_sec=0)
    assert off.select(F.max("probe_window")).first()[0] == 0


def test_seed_pipeline_paced(spark):
    sitemaps = spark.createDataFrame(
        [("https://h.test/sitemap-a.xml", SITEMAP_A),
         ("https://h.test/sitemap-b.xml", SITEMAP_B)],
        "url string, xml string",
    )
    out = SM.seed_urls_pipeline(
        spark, sitemaps,
        ["https://h.test/sitemap-a.xml", "https://h.test/sitemap-b.xml"],
        hits_per_sec=1,
    ).collect()
    # two candidate urls, budget 1/window → windows 0 and 1 in url order
    assert [(r["url"], r["probe_window"]) for r in sorted(out, key=lambda r: r.url)] == [
        ("https://h.test/blog/beta-post", 0),
        ("https://h.test/docs/alpha", 1),
    ]


# ── A6/A7 adaptive metrics ───────────────────────────────────────────

def test_adaptive_metrics(spark):
    rows = [
        (1, 1, "spark shuffle partition spark"),
        (2, 1, "spark executor memory"),
        (3, 2, "spark shuffle executor"),
        (4, 3, "spark shuffle executor memory"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, iteration int, text string")
    cov = AD.coverage(df, ["spark", "shuffle", "quantum"])
    assert 0.0 < cov < 1.2
    cons = AD.consistency(df)
    assert 0.0 < cons <= 1.0
    hist = AD.new_terms_per_iteration(df)
    assert hist[0] >= hist[-1]          # vocabulary growth slows
    sat = AD.saturation(hist)
    assert 0.0 <= sat <= 1.0
    conf = AD.confidence(cov, cons, sat)
    assert 0.0 <= conf <= 1.2


def test_consistency_max_df_guard(spark):
    """The hot-term guard (VERDICT r3 #4): a stop word shared by every
    doc must not drive the inverted-index self-join quadratic.  With
    max_df, candidates come only from rare terms, but each candidate
    pair's Jaccard stays EXACT over the full term sets — so docs whose
    only overlap is the hot term drop to 0 (conservative), while
    rare-term pairs keep their exact value."""
    # 20 docs all containing hot term "the"; docs 1 and 2 also share
    # rare term "zebra" (sets: {the, zebra, aa}, {the, zebra, bb}).
    rows = [(1, "the zebra aa"), (2, "the zebra bb")] + [
        (i, f"the only{i}") for i in range(3, 21)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = len(rows)
    total_pairs = n * (n - 1) // 2
    guarded = AD.consistency(df, max_df=3)
    # only the (1,2) candidate survives: jaccard({the,zebra,aa},
    # {the,zebra,bb}) = 2/4; every hot-only pair contributes 0
    assert abs(guarded - (2 / 4) / total_pairs) < 1e-9
    # unguarded exact: pairs sharing only "the" contribute 1/|a∪b| > 0
    exact = AD.consistency(df)
    assert exact > guarded > 0.0
