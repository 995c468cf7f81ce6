"""Golden tests for the native-Column filter compilers.

Truth tables ported from
/root/reference/tests/general/test_deep_crawl_filters.py.
"""

from __future__ import annotations

from crawl4ai_spark.functions import filters as FL

PATTERN_CASES = [
    ("*.html", {
        "https://example.com/page.html": True,
        "https://example.com/path/doc.html": True,
        "https://example.com/page.htm": False,
        "https://example.com/page.html?param=1": True,
    }),
    ("*/article/*", {
        "https://example.com/article/123": True,
        "https://example.com/blog/article/456": True,
        "https://example.com/articles/789": False,
        "https://example.com/article": False,
    }),
    ("blog-*-[0-9]", {
        "https://example.com/blog-post-1": True,
        "https://example.com/blog-test-9": True,
        "https://example.com/blog-post": False,
        "https://example.com/blog-post-x": False,
    }),
    (["*.pdf", "*/download/*"], {
        "https://example.com/doc.pdf": True,
        "https://example.com/download/file.txt": True,
        "https://example.com/path/download/doc": True,
        "https://example.com/uploads/file.txt": False,
    }),
    ("*", {
        "https://example.com": True,
        "http://test.com/path": True,
    }),
    (r"^https?://.*\.example\.com/\d+", {
        "https://sub.example.com/123": True,
        "http://test.example.com/456": True,
        "https://example.com/789": False,
        "https://sub.example.com/abc": False,
    }),
    # single-star prefix (the PREFIX category with path-boundary rule:
    # exact prefix match or next char in /?# — filters.py:239-244)
    ("https://example.com/api/*", {
        "https://example.com/api/v1": True,
        "https://example.com/api": True,
        "https://example.com/apiv2/x": False,
    }),
]

DOMAIN_CASES = [
    ({"allowed": "example.com"}, {
        "https://example.com/page": True,
        "http://example.com": True,
        "https://sub.example.com": False,   # subdomain of allowed IS allowed per _is_subdomain… see note
        "https://other.com": False,
    }),
    ({"allowed": ["example.com", "test.com"]}, {
        "https://example.com/page": True,
        "https://test.com/home": True,
        "https://other.com": False,
    }),
    ({"blocked": "malicious.com"}, {
        "https://malicious.com": False,
        "https://safe.com": True,
        "http://malicious.com/login": False,
    }),
    ({"blocked": ["spam.com", "ads.com"]}, {
        "https://spam.com": False,
        "https://ads.com/banner": False,
        "https://example.com": True,
    }),
    ({"allowed": "example.com", "blocked": "sub.example.com"}, {
        "https://example.com": True,
        "https://sub.example.com": False,
        "https://other.com": False,
    }),
]

CONTENT_TYPE_CASES = [
    ({"allowed": "image/png"}, {
        "https://example.com/image.png": True,
        "https://example.com/photo.jpg": False,
        "https://example.com/document.pdf": False,
    }),
    ({"allowed": ["image/jpeg", "application/pdf"]}, {
        "https://example.com/photo.jpg": True,
        "https://example.com/document.pdf": True,
        "https://example.com/script.js": False,
    }),
    ({"allowed": "application/json"}, {
        "https://example.com/api/data": True,   # no extension → allowed
        "https://example.com/data.json": True,
        "https://example.com/page.html": False,
    }),
    ({"allowed": "application/octet-stream"}, {
        "https://example.com/file.unknown": True,
        "https://example.com/archive.zip": False,
        "https://example.com/software.exe": False,
    }),
]


def eval_pred(spark, urls, pred_col):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return {r["url"]: bool(r["p"]) for r in df.withColumn("p", pred_col).collect()}


def test_url_pattern_filter(spark):
    for patterns, table in PATTERN_CASES:
        got = eval_pred(spark, table, FL.url_pattern_filter("url", patterns))
        for u, exp in table.items():
            assert got[u] == exp, f"pattern {patterns} url {u}"


def test_url_pattern_filter_reverse(spark):
    table = {"https://e.com/x.html": False, "https://e.com/x.txt": True}
    got = eval_pred(spark, table, FL.url_pattern_filter("url", "*.html", reverse=True))
    for u, exp in table.items():
        assert got[u] == exp, u


def test_domain_filter(spark):
    # NOTE on first case: the reference test file expects
    # sub.example.com → False for allowed=example.com, but the live
    # DomainFilter._is_subdomain (filters.py:458-461) ALLOWS subdomains
    # of an allowed domain.  We pin the LIVE semantics (subdomains of
    # allowed pass), mirroring what a real crawl does.
    overrides = {("example.com", "https://sub.example.com"): True}
    for params, table in DOMAIN_CASES:
        pred = FL.domain_filter(
            "url",
            allowed_domains=params.get("allowed"),
            blocked_domains=params.get("blocked"),
        )
        got = eval_pred(spark, table, pred)
        for u, exp in table.items():
            exp = overrides.get((params.get("allowed") if isinstance(params.get("allowed"), str) else None, u), exp)
            # blocked beats allowed: sub.example.com blocked case stays False
            if params.get("blocked") == "sub.example.com" and u == "https://sub.example.com":
                exp = False
            assert got[u] == exp, f"params {params} url {u}"


def test_content_type_filter(spark):
    for params, table in CONTENT_TYPE_CASES:
        pred = FL.content_type_filter("url", params["allowed"])
        got = eval_pred(spark, table, pred)
        for u, exp in table.items():
            assert got[u] == exp, f"params {params} url {u}"


def test_nonsense_url_filter(spark):
    table = {
        "https://e.com/robots.txt": False,
        "https://e.com/sitemap.xml": False,
        "https://e.com/sitemap-news.xml": False,
        "https://e.com/favicon.ico": False,
        "https://e.com/.hidden/page": False,
        "https://e.com/wp-admin/options.php": False,
        "https://e.com/cart": False,
        "https://e.com/page?print=1": False,
        "https://e.com/a": False,               # path < 3 chars
        "https://e.com/en": True,               # whitelisted short path
        "https://e.com/articles/2024/post": True,
        "https://e.com/blog": True,
    }
    got = eval_pred(spark, table, FL.nonsense_url_filter("url"))
    for u, exp in table.items():
        assert got[u] == exp, u


def test_valid_crawl_url(spark):
    table = {
        "https://example.com/x": True,
        "http://example.com": True,
        "ftp://example.com/x": False,
        "https://localhost/x": False,      # no dot in netloc
        "not-a-url": False,
    }
    got = eval_pred(spark, table, FL.valid_crawl_url("url"))
    for u, exp in table.items():
        assert got[u] == exp, u


def test_filter_chain_conjunction(spark):
    pred = FL.filter_chain(
        FL.valid_crawl_url("url"),
        FL.url_pattern_filter("url", "*.html"),
        FL.domain_filter("url", allowed_domains="example.com"),
    )
    table = {
        "https://example.com/a.html": True,
        "https://example.com/a.txt": False,
        "https://other.com/a.html": False,
    }
    got = eval_pred(spark, table, pred)
    for u, exp in table.items():
        assert got[u] == exp, u


def test_filters_stay_native(spark):
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame([("https://a.com/x.html",)], ["url"]).filter(
        FL.filter_chain(
            FL.valid_crawl_url("url"),
            FL.url_pattern_filter("url", ["*.html", "*/article/*"]),
            FL.content_type_filter("url", "text/html"),
            FL.nonsense_url_filter("url"),
        )
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
