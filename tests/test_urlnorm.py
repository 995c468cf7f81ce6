"""Golden tests for URL canonicalization.

Cases ported from /root/reference/tests/test_normalize_url.py (urljoin
resolution behavior) plus tracking-param / query-sort / fragment cases
pinned to the live reference semantics (utils.py:2142-2273 — the
extended normalize_url shadows the earlier fragment-keeping def, so
fragments are dropped by default in live code).
"""

from __future__ import annotations

import pytest

from crawl4ai_spark.functions.urlnorm import (
    canonicalize_for_crawl,
    get_base_domain,
    get_host,
    is_external_url,
    is_valid_crawl_url,
    normalize_url,
    url_depth,
)

# (href, base, expected) — urljoin-resolution goldens from the reference test file
JOIN_GOLDENS = [
    ("path/to/page.html", "http://example.com/base/", "http://example.com/base/path/to/page.html"),
    ("page.html", "http://example.com/base/", "http://example.com/base/page.html"),
    ("page.html", "http://example.com/base", "http://example.com/page.html"),
    ("http://another.com/page.html", "http://example.com/", "http://another.com/page.html"),
    ("  page.html  ", "http://example.com/", "http://example.com/page.html"),
    ("page.html?query=test", "http://example.com/", "http://example.com/page.html?query=test"),
    ("https://secure.example.com/page.html", "http://example.com/", "https://secure.example.com/page.html"),
    ("../otherpage.html", "http://example.com/base/current/", "http://example.com/base/otherpage.html"),
    ("/otherpage.html", "http://example.com/base/current/", "http://example.com/otherpage.html"),
    ("file.html", "http://example.com/path", "http://example.com/file.html"),
    ("page.html", "http://example.com", "http://example.com/page.html"),
    ("?query=true", "http://example.com/page.html", "http://example.com/page.html?query=true"),
    ("./P020241203375994691134.xlsx", "http://example.com/zwgk/fdzdgk/zdxx/spaq/t19360680.shtml",
     "http://example.com/zwgk/fdzdgk/zdxx/spaq/P020241203375994691134.xlsx"),
    ("another.doc", "http://example.com/zwgk/fdzdgk/zdxx/spaq/t19360680.shtml",
     "http://example.com/zwgk/fdzdgk/zdxx/spaq/another.doc"),
    ("path/file.html", "http://example.com:8080/base/", "http://example.com:8080/base/path/file.html"),
    ("path%20with%20spaces/file.html", "http://example.com/", "http://example.com/path%20with%20spaces/file.html"),
]


@pytest.mark.parametrize("href,base,expected", JOIN_GOLDENS)
def test_normalize_join_goldens(href, base, expected):
    assert normalize_url(href, base) == expected


def test_normalize_drops_fragment_and_tracking_and_sorts_query():
    # live reference semantics: fragment dropped, utm_*/gclid/fbclid/ref dropped, keys sorted
    assert normalize_url("page.html#section", "http://example.com/") == "http://example.com/page.html"
    assert (
        normalize_url("/p?utm_source=x&b=2&a=1&gclid=99&ref=abc#top", "https://Example.COM/base/")
        == "https://example.com/p?a=1&b=2"
    )
    # uppercase host lowered; trailing slash stripped except root
    assert normalize_url("https://EXAMPLE.com/A/B/", "https://example.com/") == "https://example.com/A/B"
    assert normalize_url("https://EXAMPLE.com/", "https://example.com/") == "https://example.com/"


def test_canonicalize_for_crawl_identity():
    # deep-crawl variant: smaller tracking set, parse_qs regroup, rstrip all '/'
    assert (
        canonicalize_for_crawl("/a/?utm_source=x&z=1&utm_campaign=c", "https://Ex.COM/")
        == "https://ex.com/a?z=1"
    )
    # utm_term is NOT in the deep-crawl drop set (reference quirk — identity-defining)
    assert canonicalize_for_crawl("/a?utm_term=k", "https://ex.com/") == "https://ex.com/a?utm_term=k"
    # duplicate query keys regrouped adjacently in first-occurrence order (parse_qs→urlencode)
    assert canonicalize_for_crawl("/p?b=2&a=1&b=3", "http://h.test/") == "http://h.test/p?b=2&b=3&a=1"
    # root collapses: all trailing slashes stripped
    assert canonicalize_for_crawl("http://h.test/", "http://h.test/") == "http://h.test"
    assert canonicalize_for_crawl("#frag", "http://h.test/p") == "http://h.test/p"
    assert canonicalize_for_crawl(None, "http://h.test/") is None
    assert canonicalize_for_crawl("", "http://h.test/") is None


def test_host_and_base_domain():
    assert get_host("https://WWW.Sub.Example.co.uk:8443/p") == "www.sub.example.co.uk:8443"
    assert get_base_domain("https://www.sub.example.co.uk:8443/p") == "example.co.uk"
    assert get_base_domain("https://blog.example.com/x") == "example.com"
    assert get_base_domain("not a url") == ""


def test_is_external():
    assert is_external_url("mailto:x@y.com", "example.com")
    assert not is_external_url("/relative/path", "example.com")
    assert not is_external_url("https://sub.example.com/a", "example.com")
    assert is_external_url("https://other.org/a", "example.com")


def test_is_valid_crawl_url():
    assert is_valid_crawl_url("https://example.com/a")
    assert not is_valid_crawl_url("ftp://example.com/a")
    assert not is_valid_crawl_url("https://localhost/a")  # no dot in netloc
    assert not is_valid_crawl_url("nonsense")


def test_url_depth():
    # PathDepthScorer._quick_depth goldens (scorers.py docstring examples)
    assert url_depth("http://example.com") == 0
    assert url_depth("http://example.com/") == 0
    assert url_depth("http://example.com/a") == 1
    assert url_depth("http://example.com/a/b") == 2
    assert url_depth("http://example.com/a//b/") == 2


def test_udfs_match_pure_python(spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.udfs import canonicalize_udf, host_udf, is_valid_url_udf

    rows = [
        ("/a/?utm_source=x&z=1", "https://Ex.COM/"),
        ("page.html#sec", "http://example.com/base/"),
        ("ftp://x.y/a", "http://example.com/"),
        (None, "http://example.com/"),
    ]
    df = spark.createDataFrame(rows, ["href", "base"]).select(
        "href",
        "base",
        canonicalize_udf("href", "base").alias("canon"),
        host_udf(F.coalesce("href", F.lit(""))).alias("host"),
        is_valid_url_udf(F.coalesce("href", F.lit(""))).alias("ok"),
    )
    got = {(r.href, r.base): (r.canon, r.host, r.ok) for r in df.collect()}
    for href, base in rows:
        canon, host, ok = got[(href, base)]
        assert canon == canonicalize_for_crawl(href, base)
        assert host == get_host(href or "")
        assert ok == is_valid_crawl_url(href or "")
