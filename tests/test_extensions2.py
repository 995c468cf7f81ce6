"""Round-2 surface: cache modes (S10/J3), CC-index seed (S2), seeder
cache (S11), KB export (S12), filter/scoring stats (A1/A2), per-URL
config matcher (F12), fairness aging (O5), fetch transports (S5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.plans.cache import (
    CacheMode, cache_lookup, cache_merge, should_read, should_write,
)
from crawl4ai_spark.plans.config import CrawlConfig
from crawl4ai_spark.plans.crawl import CrawlEngine
from crawl4ai_spark.sources.cc_index import (
    SeederCache, cc_glob, cc_index_seed, kb_export, kb_import, normalize_cc_domain,
)
from crawl4ai_spark.sources.fetch import (
    FetchResult, SyntheticTransport, UrllibTransport, make_fetch_udf,
)
from crawl4ai_spark.sources.synthetic_web import (
    WebConfig, robots_rows, seed_urls, synthetic_pages_pdf,
)
from crawl4ai_spark.operators.stats import filter_stats, match_config, scoring_stats
from crawl4ai_spark.testing.simulator import simulate_crawl

WEB = WebConfig(n_pages=160, n_hosts=6, seed=42)


# ── cache modes (cache_context.py:1-92 truth table) ──────────────────

def test_cache_mode_truth_table():
    assert should_read(CacheMode.ENABLED) and should_write(CacheMode.ENABLED)
    assert should_read(CacheMode.READ_ONLY) and not should_write(CacheMode.READ_ONLY)
    assert not should_read(CacheMode.WRITE_ONLY) and should_write(CacheMode.WRITE_ONLY)
    assert not should_read(CacheMode.BYPASS) and not should_write(CacheMode.BYPASS)
    assert not should_read(CacheMode.DISABLED) and not should_write(CacheMode.DISABLED)
    assert not should_read(CacheMode.ENABLED, always_bypass=True)
    assert not should_write(CacheMode.ENABLED, always_bypass=True)


def test_cache_lookup_and_merge(spark):
    batch = spark.createDataFrame(
        [("https://a.test/x",), ("https://a.test/y",), ("raw:inline",)],
        "url string",
    )
    cache = spark.createDataFrame(
        [("https://a.test/x", "https://a.test/x", 200, "<p>cached</p>", 1),
         ("raw:inline", "raw:inline", 200, "nope", 1)],
        "url string, final_url string, status_code int, html string, fetched_at_iter int",
    )
    out = {r["url"]: r for r in cache_lookup(batch, cache).collect()}
    assert out["https://a.test/x"]["cache_hit"] is True
    assert out["https://a.test/y"]["cache_hit"] is False
    assert out["raw:inline"]["cache_hit"] is False      # raw: not cacheable

    fetched = spark.createDataFrame(
        [("https://a.test/x", "https://a.test/x", 200, "<p>new</p>"),
         ("https://a.test/z", "https://a.test/z", 404, None),
         ("raw:other", "raw:other", 200, "<p>raw</p>")],
        "url string, final_url string, eff_status int, eff_html string",
    )
    merged = {r["url"]: r for r in cache_merge(cache, fetched, 2).collect()}
    assert merged["https://a.test/x"]["html"] == "<p>new</p>"   # last writer wins
    assert merged["https://a.test/x"]["fetched_at_iter"] == 2
    assert "https://a.test/z" not in merged                      # non-200 not cached
    assert "raw:other" not in merged                             # not cacheable
    assert merged["raw:inline"]["html"] == "nope"                # old row retained


def test_cache_write_then_read_only_crawl(spark):
    """WRITE_ONLY crawl builds a cache; a READ_ONLY crawl against an
    EMPTY corpus must reproduce the same docs from cache alone."""
    pdf = synthetic_pages_pdf(WEB)
    pages_df = spark.createDataFrame(pdf).cache()
    robots_df = spark.createDataFrame(robots_rows(WEB))
    seeds = seed_urls(WEB, n_seeds=4)
    cfg = CrawlConfig(mode="bfs", max_depth=2, max_pages=20,
                      base_budget=8, global_budget=16, max_iterations=6)
    first = CrawlEngine(spark, cfg, pages_df, robots_df,
                        cache_mode=CacheMode.WRITE_ONLY)
    r1 = first.run(seeds)
    docs1 = {r["doc_id"] for r in r1.docs.collect()}
    assert docs1 and first.page_cache.count() >= len(docs1)

    empty_pages = spark.createDataFrame([], pages_df.schema)
    second = CrawlEngine(spark, cfg, empty_pages, robots_df,
                         cache_mode=CacheMode.READ_ONLY,
                         page_cache=first.page_cache)
    r2 = second.run(seeds)
    docs2 = {r["doc_id"] for r in r2.docs.collect()}
    assert docs2 == docs1


# ── fairness aging parity (O5) ───────────────────────────────────────

def test_fairness_aging_parity(spark):
    pdf = synthetic_pages_pdf(WEB)
    pages = {r["url"]: r for r in pdf.to_dict("records")}
    robots = {r["host"]: r["rules"] for r in robots_rows(WEB)}
    pages_df = spark.createDataFrame(pdf).cache()
    robots_df = spark.createDataFrame(robots_rows(WEB))
    seeds = seed_urls(WEB, n_seeds=6)
    cfg = CrawlConfig(mode="best_first", max_depth=3, max_pages=40,
                      base_budget=2, global_budget=6, max_iterations=40,
                      fairness_timeout_iters=2)
    sim = simulate_crawl(pages, robots, seeds, cfg)
    eng = CrawlEngine(spark, cfg, pages_df, robots_df).run(seeds)
    log = eng.crawl_log.orderBy("iteration", "batch_rank").select(
        "iteration", "url", "outcome").collect()
    got = [(r["iteration"], r["url"], r["outcome"]) for r in log]
    exp = [(o["iteration"], o["url"], o["outcome"]) for o in sim.crawl_order]
    assert got == exp
    assert sim.pages_crawled > 5


# ── CC index (S2) + seeder cache (S11) + KB export (S12) ─────────────

def test_cc_domain_normalization():
    assert normalize_cc_domain("https://Example.com?q=1#f") == "Example.com"
    assert normalize_cc_domain(".docs.example.com/path") == "docs.example.com/path"
    assert cc_glob("example.com") == "*.example.com/*"
    assert cc_glob("example.com/blog") == "*.example.com/blog*"


def test_cc_index_seed(spark):
    cc = spark.createDataFrame(
        [("https://example.com/a",), ("https://docs.example.com/b?x=1",),
         ("https://example.com/a",), ("https://other.org/c",),
         ("http://example.com.evil.org/d",)],
        "url string",
    )
    got = [r["url"] for r in cc_index_seed(cc, "example.com").collect()]
    assert got == ["https://docs.example.com/b?x=1", "https://example.com/a"]
    got2 = [r["url"] for r in cc_index_seed(cc, "example.com", "*docs*").collect()]
    assert got2 == ["https://docs.example.com/b?x=1"]


def test_seeder_cache_roundtrip(spark, tmp_path):
    cache = SeederCache(str(tmp_path / "seeds"))
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.createDataFrame([("https://example.com/a",)], "url string")

    a = cache.load_or(spark, "cc", "example.com", "*", compute)
    b = cache.load_or(spark, "cc", "example.com", "*", compute)
    assert calls["n"] == 1                      # second call served from cache
    assert a.collect() == b.collect()
    cache.load_or(spark, "cc", "example.com", "*", compute, force=True)
    assert calls["n"] == 2


def test_kb_export_import(spark, tmp_path):
    docs = spark.createDataFrame(
        [("u1", "md1"), ("u2", "md2")], "doc_id string, raw_markdown string"
    )
    path = str(tmp_path / "kb")
    kb_export(docs, path)
    back = kb_import(spark, path)
    assert {(r["doc_id"], r["raw_markdown"]) for r in back.collect()} == {
        ("u1", "md1"), ("u2", "md2")
    }


# ── stats (A1/A2) + config matcher (F12) ─────────────────────────────

def test_filter_stats(spark):
    df = spark.createDataFrame(
        [("https://a.test/docs/x.html",), ("https://a.test/img/y.png",),
         ("https://b.test/docs/z.html",)],
        "url string",
    )
    specs = [
        {"kind": "pattern", "patterns": ["*/docs/*"]},
        {"kind": "content_type", "allowed_types": "text/html"},
    ]
    rows = {r["filter"]: r for r in filter_stats(df, specs).collect()}
    assert rows["pattern"]["total"] == 3
    assert rows["pattern"]["passed"] == 2 and rows["pattern"]["rejected"] == 1
    assert rows["content_type"]["passed"] == 2


def test_scoring_stats(spark):
    df = spark.createDataFrame([(0.2,), (0.8,), (0.5,)], "score double")
    r = scoring_stats(df).collect()[0]
    assert r["urls_scored"] == 3
    assert r["min_score"] == pytest.approx(0.2)
    assert r["max_score"] == pytest.approx(0.8)
    assert r["average_score"] == pytest.approx(0.5)
    empty = spark.createDataFrame([], "score double")
    r0 = scoring_stats(empty).collect()[0]
    assert r0["urls_scored"] == 0 and r0["average_score"] == 0.0


def test_match_config(spark):
    df = spark.createDataFrame(
        [("https://a.test/docs/x",), ("https://a.test/blog/y",),
         ("https://a.test/other",)],
        "url string",
    )
    configs = [
        {"id": "docs", "matcher": "*/docs/*"},
        {"id": "both", "matcher": ["*blog*", "*a.test*"], "match_mode": "and"},
        {"id": "all", "matcher": None},
    ]
    got = {r["url"]: r["cfg"] for r in df.select(
        "url", match_config(F.col("url"), configs).alias("cfg")).collect()}
    assert got["https://a.test/docs/x"] == "docs"
    assert got["https://a.test/blog/y"] == "both"
    assert got["https://a.test/other"] == "all"


# ── fetch transports (S5) ────────────────────────────────────────────

def test_synthetic_transport_redirect():
    pages = {
        "https://a.test/1": {"status_code": 301, "redirect_to": "https://a.test/2", "html": None},
        "https://a.test/2": {"status_code": 200, "redirect_to": None, "html": "<p>hi</p>"},
    }
    t = SyntheticTransport(pages)
    r1, r2, r3 = t.fetch_batch(["https://a.test/1", "https://a.test/2", "https://a.test/x"])
    assert (r1.status_code, r1.html, r1.final_url) == (200, "<p>hi</p>", "https://a.test/2")
    assert r2.status_code == 200
    assert r3.status_code == 0 and r3.error == "not_found"


def test_urllib_transport_file_and_raw(tmp_path):
    p = tmp_path / "page.html"
    p.write_text("<h1>local</h1>", encoding="utf-8")
    t = UrllibTransport()
    r_file, r_raw, r_bad = t.fetch_batch(
        [f"file://{p}", "raw:<p>inline</p>", "gopher://x"]
    )
    assert r_file.status_code == 200 and r_file.html == "<h1>local</h1>"
    assert r_raw.status_code == 200 and r_raw.html == "<p>inline</p>"
    assert r_bad.status_code == 0 and "unsupported scheme" in r_bad.error


def test_fetch_udf_batches(spark):
    pages = {"https://a.test/2": {"status_code": 200, "redirect_to": None, "html": "<p>x</p>"}}
    udf = make_fetch_udf(lambda: SyntheticTransport(pages))
    df = spark.createDataFrame([("https://a.test/2",), ("https://a.test/miss",)], "url string")
    rows = {r["url"]: r["f"] for r in df.select("url", udf(F.col("url")).alias("f")).collect()}
    assert rows["https://a.test/2"]["status_code"] == 200
    assert rows["https://a.test/miss"]["status_code"] == 0
