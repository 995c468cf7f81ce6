"""Round-2 small operators: URL-relevance fallback (R10), HEAD
liveness probe (S8), queue stats (A5 batch form), cheap canonicalize
(C3), BM25 content filter already covered in test_fit_filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.url_relevance import (
    make_url_relevance_udf, url_relevance_score_py,
)
from crawl4ai_spark.functions.urlnorm import cheap_canonicalize
from crawl4ai_spark.operators.stats import queue_stats
from crawl4ai_spark.sources.fetch import SyntheticTransport, head_probe_one, make_head_probe_udf


# ── R10 url relevance (async_url_seeder.py:1196-1282 semantics) ──────

def test_url_relevance_ordering():
    # Goldens derived from the reference algorithm
    # (async_url_seeder.py:1196-1282): a short path part that exactly
    # equals a query token scores 0.7·|token|/|part| = 0.7, which
    # OUTRANKS a long hyphenated slug containing all tokens
    # (0.7·|token|/|slug| ≈ 0.22 each) — the reference has no
    # hyphen-splitting, so "apache-spark-tuning" is one 19-char part.
    q = "apache spark tuning"
    slug = url_relevance_score_py(q, "https://docs.example.com/apache-spark-tuning/guide")
    exact_part = url_relevance_score_py(q, "https://example.com/spark/overview")
    lo = url_relevance_score_py(q, "https://example.com/cooking/pasta")
    assert exact_part > slug > lo
    assert abs(exact_part - 0.6944444444444444) < 1e-9
    assert abs(slug - 0.20297940503432493) < 1e-9
    assert 0.0 <= lo <= slug <= exact_part <= 1.0


def test_url_relevance_exact_component():
    # query == a path part → token containment 0.7 plus the exact
    # substring 1.0 diluted by 1/(i+1) weighting over the other
    # evidence rows (domain tokens, n-gram jaccard) → 0.7545…, NOT 1.0
    # (the reference averages; it does not take the max).
    s = url_relevance_score_py("spark", "https://example.com/spark")
    assert abs(s - 0.7545454545454546) < 1e-9
    # and it beats a URL where the token is merely a slug prefix
    assert s > url_relevance_score_py("spark", "https://example.com/sparkling-water")
    assert url_relevance_score_py("", "https://example.com/x") == 0.0
    assert url_relevance_score_py("q", "") == 0.0


def test_url_relevance_udf(spark):
    udf = make_url_relevance_udf("apache spark")
    df = spark.createDataFrame(
        [("https://example.com/apache-spark/docs",),
         ("https://example.com/gardening",)], "url string")
    rows = df.select("url", udf("url").alias("s")).collect()
    got = {r["url"]: r["s"] for r in rows}
    for url, s in got.items():
        assert s == pytest.approx(url_relevance_score_py("apache spark", url))


# ── S8 HEAD probe ────────────────────────────────────────────────────

PAGES = {
    "https://a.test/ok": {"status_code": 200, "redirect_to": None, "html": "x"},
    "https://a.test/moved": {"status_code": 301, "redirect_to": "https://a.test/ok", "html": None},
    "https://a.test/gone": {"status_code": 404, "redirect_to": None, "html": None},
}


def test_head_probe_synthetic():
    t = SyntheticTransport(PAGES)
    assert head_probe_one(t, PAGES, "https://a.test/ok") == "https://a.test/ok"
    assert head_probe_one(t, PAGES, "https://a.test/moved") == "https://a.test/ok"
    assert head_probe_one(t, PAGES, "https://a.test/gone") is None
    assert head_probe_one(t, PAGES, "https://a.test/missing") is None


def test_head_probe_udf(spark):
    udf = make_head_probe_udf(lambda: SyntheticTransport(PAGES))
    df = spark.createDataFrame([(u,) for u in PAGES] + [("https://a.test/nope",)], "url string")
    got = {r["url"]: r["alive"] for r in df.select("url", udf("url").alias("alive")).collect()}
    assert got["https://a.test/ok"] == "https://a.test/ok"
    assert got["https://a.test/moved"] == "https://a.test/ok"
    assert got["https://a.test/gone"] is None
    assert got["https://a.test/nope"] is None


# ── A5 queue stats ───────────────────────────────────────────────────

def test_queue_stats(spark):
    frontier = spark.createDataFrame(
        [("u1", "pending", 1), ("u2", "pending", 3), ("u3", "done", 0)],
        "url string, status string, enqueue_iter int",
    )
    r = queue_stats(frontier, current_iteration=4).collect()[0]
    assert r["total_queued"] == 2
    assert r["highest_wait_iters"] == 3
    assert r["avg_wait_iters"] == pytest.approx(2.0)
    empty = spark.createDataFrame([], "url string, status string, enqueue_iter int")
    r0 = queue_stats(empty, 1).collect()[0]
    assert r0["total_queued"] == 0 and r0["highest_wait_iters"] == 0


# ── C3 cheap canonicalize ────────────────────────────────────────────

def test_cheap_canonicalize():
    assert cheap_canonicalize("/a/b#frag", "https://EX.test/base") == "https://ex.test/a/b"
    # query and trailing slash preserved (unlike the full canonicalizer)
    assert cheap_canonicalize(
        "https://EX.test/a/?utm_source=x", "https://ex.test"
    ) == "https://ex.test/a/?utm_source=x"
    assert cheap_canonicalize(None, "https://ex.test") is None
