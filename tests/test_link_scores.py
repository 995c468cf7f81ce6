"""Link intrinsic/total scoring (R7, R9) + link preview selection
(O7, O8, J6): the native Column implementation must agree with the
Python mirror on a case battery covering every rule branch, and the
mirror itself pins hand-computed goldens for representative cases.

Behavioral spec: utils.py:3098-3304, link_preview.py:120-175,380-390.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.link_scores import (
    _tokens_py,
    is_docs_site,
    link_intrinsic_score,
    link_intrinsic_score_py,
    link_total_score,
    link_total_score_py,
    page_terms,
    score_links,
)

PAGE_TITLE = "Spark Frontier Guide"
HEADLINES = "Crawling at scale; Politeness budgets"
META = "A guide to distributed crawling with Spark."

CASES = [
    # (text, url, title_attr, class_attr, rel_attr)
    ("Read the API reference", "https://docs.example.com/docs/api", "API docs page", "nav-primary", ""),
    ("click here", "http://example.com/track/x/y/z/w/v/u", "", "ad-banner promo", "nofollow"),
    ("Spark crawling guide for scale", "https://example.com/blog/spark", "", "", "next"),
    ("here", "https://example.com/login/", None, None, None),
    ("", "https://example.com/", "", "", ""),
    ("Politeness budgets explained in depth", "https://example.com/a/b/c/d/e/f/g", "ttl", "main", "ugc"),
    ("x y", "ftp://weird.example/path", "abcd", "menu ad", "canonical sponsored"),
    ("Guide", "https://api.example.com/guide/", "t", "", ""),
]


def _expected(text, url, title_attr, class_attr, rel_attr, docs):
    terms = _tokens_py(f"{PAGE_TITLE} {HEADLINES} {META}")
    return link_intrinsic_score_py(text, url, title_attr, class_attr, rel_attr, terms, docs)


def test_py_goldens_hand_checked():
    terms = _tokens_py(f"{PAGE_TITLE} {HEADLINES} {META}")
    # case: title(+1), nav class(+1.5), /docs/(+2), url depth
    # 4 slashes - 2 = 2 ≤ 2 (+1), https(+0.5), len>3(+1), 4 words
    # (+0.5+0.5), term overlap {read,the,api,reference} ∩ terms = {}
    # (+0), docs-site + 'api'/'reference' in text (+1) = 9.0
    s = link_intrinsic_score_py(
        "Read the API reference", "https://docs.example.com/docs/api",
        "API docs page", "nav-primary", "", terms, True,
    )
    assert s == pytest.approx(9.0)
    # generic text + bad class + bad path + nofollow + http + deep URL
    s2 = link_intrinsic_score_py(
        "click here", "http://example.com/track/x/y/z/w/v/u",
        "", "ad-banner promo", "nofollow", terms, False,
    )
    # -1(ad) -0.5(nofollow) -1.5(track) -0.5(depth>5) +1(len>3)
    # +0.5(2 words) -1(generic) = clamp → 0.0
    assert s2 == 0.0


def test_total_score_py():
    assert link_total_score_py(7.0, 0.5, False, True) == 5.0
    assert link_total_score_py(7.0, None, True, True) == 7.0
    assert link_total_score_py(7.0, 0.5, True, False) == 7.0
    assert link_total_score_py(7.0, 0.5, True, True) == pytest.approx(0.7 * 7 + 0.3 * 5)
    assert link_total_score_py(None, 2.0, True, True) == pytest.approx(0.3 * 10.0)
    assert link_total_score_py(20.0, None, True, False) == 10.0


def test_spark_matches_python_mirror(spark):
    rows = [
        (i, t, u, ta, ca, ra)
        for i, (t, u, ta, ca, ra) in enumerate(CASES)
    ]
    df = spark.createDataFrame(
        rows, "id int, text string, url string, title_attr string, class_attr string, rel_attr string"
    ).withColumn("page_title", F.lit(PAGE_TITLE)) \
     .withColumn("headlines", F.lit(HEADLINES)) \
     .withColumn("meta_description", F.lit(META))
    terms = page_terms(F.col("page_title"), F.col("headlines"), F.col("meta_description"))
    docs = is_docs_site(F.col("url"))
    out = df.select(
        "id",
        link_intrinsic_score(
            F.col("text"), F.col("url"), F.col("title_attr"),
            F.col("class_attr"), F.col("rel_attr"), terms, docs,
        ).alias("s"),
        docs.alias("d"),
    ).orderBy("id").collect()
    for r, (t, u, ta, ca, ra) in zip(out, CASES):
        exp = _expected(t, u, ta, ca, ra, r["d"])
        assert r["s"] == pytest.approx(exp), (t, u, r["s"], exp)


def test_total_score_spark(spark):
    df = spark.createDataFrame(
        [(7.0, 0.5), (7.0, None), (None, 2.0)], "i double, c double"
    )
    got = df.select(
        link_total_score(F.col("i"), F.col("c"), True, True).alias("t")
    ).collect()
    assert [r["t"] for r in got] == [
        pytest.approx(0.7 * 7 + 0.3 * 5),
        pytest.approx(7.0),
        pytest.approx(3.0),
    ]
    got5 = df.select(link_total_score(F.col("i"), F.col("c"), False, False).alias("t")).collect()
    assert all(r["t"] == 5.0 for r in got5)


def test_score_links_selection(spark):
    links = spark.createDataFrame(
        [
            ("https://example.com/p", 0, "https://example.com/docs/a", "API guide"),
            ("https://example.com/p", 1, "https://example.com/blog/b", "A post"),
            ("https://example.com/p", 2, "https://example.com/cart/c", "Cart"),
            ("https://example.com/p", 3, "https://example.com/docs/d", "More docs"),
        ],
        "page_url string, link_pos int, url string, text string",
    ).withColumn("title_attr", F.lit("")) \
     .withColumn("class_attr", F.lit("")) \
     .withColumn("rel_attr", F.lit("")) \
     .withColumn("page_title", F.lit(PAGE_TITLE)) \
     .withColumn("headlines", F.lit(HEADLINES)) \
     .withColumn("meta_description", F.lit(META))
    head = spark.createDataFrame(
        [("https://example.com/docs/a", 0.9), ("https://example.com/blog/b", 0.2)],
        "url string, relevance_score double",
    )
    out = score_links(
        links, head,
        include_patterns=["*docs*", "*blog*"],   # drops /cart/
        max_links=2,                              # head-cut → pos 0, 1
        query_provided=True,
    ).orderBy(F.desc("total_score")).collect()
    urls = [r["url"] for r in out]
    assert urls == ["https://example.com/docs/a", "https://example.com/blog/b"]
    a = out[0]
    exp_i = _expected("API guide", "https://example.com/docs/a", "", "", "", False)
    assert a["intrinsic_score"] == pytest.approx(exp_i)
    assert a["total_score"] == pytest.approx(
        link_total_score_py(exp_i, 0.9, True, True)
    )
