"""ContentRelevanceFilter (F6) + SEOFilter (F7): Spark columns must
agree with the Python mirrors, and the mirrors pin hand-derived
goldens for the reference's scoring rules (filters.py:501-687),
including the published quirks (string-repetition weighting,
tf-based simplified IDF, missing-head ⇒ reject)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType

from crawl4ai_spark.functions.seo_filters import (
    content_relevance_filter,
    content_relevance_score,
    content_relevance_score_py,
    seo_filter,
    seo_score,
    seo_score_py,
)

HEADS = [
    # (url, title, meta, head_html)
    ("https://example.com/civil-war",
     "American Civil War history and causes",
     {"description": "The causes of the American civil war explained in detail "
                     "for students of history, covering slavery and secession.",
      "keywords": "civil war, history",
      "robots": "index,follow"},
     '<head><script type="application/ld+json">{}</script></head>'),
    ("https://example.com/cricket_rules?ref=1",
     "Cricket",
     {"description": "bat and ball"},
     "<head></head>"),
    ("https://example.com/empty", "", {}, ""),
    ("https://example.com/canon",
     "A title that is exactly fifty two characters long ok",
     {"description": "d" * 150, "canonical": "https://example.com/canon"},
     "<head></head>"),
]


def test_relevance_py_golden():
    # doc for case 2: title*3 = "CricketCricketCricket", desc*2 mashed,
    # keywords "", all meta values.  Query term "cricket" appears 0
    # times as a standalone token (mashed repetition!) → tf=0 →
    # idf=ln(2/0.5+1)=ln 5, contribution 0 (tf numerator) → score 0.
    s = content_relevance_score_py("Cricket", {"description": "bat and ball"},
                                   "cricket rules")
    assert s == 0.0
    # case 1: 'war' appears as standalone token in desc repeats + meta
    s2 = content_relevance_score_py(HEADS[0][1], HEADS[0][2],
                                    "causes of american civil war")
    assert s2 > 1.0


def test_relevance_tf_based_idf():
    # single-term doc: title "war", query "war": doc = "warwarwar war war ..." —
    # title*3 mashes; meta description "war" repeats twice mashed "warwar",
    # keywords absent, meta values "war" → tokens: [warwarwar, warwar, war]
    s = content_relevance_score_py("war", {"description": "war"}, "war")
    tf = 1.0  # only the meta-values copy survives as a standalone token
    dl = 3.0
    k1, b, avgdl = 1.2, 0.75, 1000
    idf = math.log(2 / (tf + 0.5) + 1)
    expected = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert s == pytest.approx(expected)


def test_seo_py_golden():
    url, title, meta, html = HEADS[3]
    # title_length 52 → 1.0 (×.15) ; no keywords → 0 (×.18)
    # desc 150 → 1.0 (×.12) ; canonical == url → 1.0 (×.10)
    # robots "" → 1.0 (×.20) ; no schema → 0 (×.10)
    # path "/canon": no penalties → 1.0 (×.15)
    assert seo_score_py(url, title, meta, html) == pytest.approx(
        0.15 + 0.12 + 0.10 + 0.20 + 0.15
    )
    # underscores + query params + noindex
    s = seo_score_py("https://example.com/cricket_rules?ref=1",
                     "Cricket", {"robots": "noindex"}, "")
    # title 0.3·0.15 + kw 0 + desc 0.2·0.12 + canonical 0.5·0.10 +
    # robot 0 + schema 0 + url 0.6·0.9·0.15
    assert s == pytest.approx(0.3 * 0.15 + 0.2 * 0.12 + 0.5 * 0.10 + 0.6 * 0.9 * 0.15)


@pytest.fixture(scope="module")
def heads_df(spark):
    return spark.createDataFrame(
        [(u, t, m, h) for u, t, m, h in HEADS],
        "url string, title string, meta map<string,string>, head_html string",
    )


def test_relevance_spark_matches_py(spark, heads_df):
    query = "causes of american civil war"
    out = heads_df.select(
        "url",
        content_relevance_score(F.col("title"), F.col("meta"), query).alias("s"),
        content_relevance_filter(F.col("title"), F.col("meta"), query, 1.0).alias("ok"),
    ).orderBy("url").collect()
    by_url = {r["url"]: r for r in out}
    for url, title, meta, _ in HEADS:
        exp = content_relevance_score_py(title, meta, query)
        assert by_url[url]["s"] == pytest.approx(exp), url
        has_head = bool(title) or bool(meta)
        assert by_url[url]["ok"] == (has_head and exp >= 1.0)


def test_seo_spark_matches_py(spark, heads_df):
    kws = ["civil war", "history"]
    out = heads_df.select(
        "url",
        seo_score(F.col("url"), F.col("title"), F.col("meta"),
                  F.col("head_html"), keywords=kws).alias("s"),
        seo_filter(F.col("url"), F.col("title"), F.col("meta"),
                   F.col("head_html"), threshold=0.5, keywords=kws).alias("ok"),
    ).collect()
    by_url = {r["url"]: r for r in out}
    for url, title, meta, html in HEADS:
        exp = seo_score_py(url, title, meta, html, keywords=kws)
        assert by_url[url]["s"] == pytest.approx(exp), url
        has_head = bool(title) or bool(meta)
        assert by_url[url]["ok"] == (has_head and exp >= 0.5), url
