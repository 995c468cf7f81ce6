"""Golden tests for the native-Column scorer compilers.

Expected values ported from
/root/reference/tests/general/test_deep_crawl_scorers.py (exact
per-URL scores, tolerance 1e-5 like the reference test).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions import scorers as S

TOL = 1e-5


def score_all(spark, urls, col):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.withColumn("s", col).collect()
    return {r["url"]: r["s"] for r in rows}


KEYWORD_GOLDENS = {
    "https://example.com/python-blog": 1.0,
    "https://example.com/PYTHON-BLOG": 1.0,
    "https://example.com/python-only": 0.5,
    "https://example.com/other": 0.0,
}

PATH_DEPTH_GOLDENS = {  # optimal_depth=2
    "https://example.com/a/b": 1.0,
    "https://example.com/a": 0.5,
    "https://example.com/a/b/c": 0.5,
    "https://example.com": 1.0 / 3.0,
}

CONTENT_TYPE_GOLDENS = {  # {'.html$':1.0, '.pdf$':0.8, '.jpg$':0.6}
    "https://example.com/doc.html": 1.0,
    "https://example.com/doc.pdf": 0.8,
    "https://example.com/img.jpg": 0.6,
    "https://example.com/other.txt": 0.0,
}

FRESHNESS_GOLDENS = {  # current_year=2024
    "https://example.com/2024/01/post": 1.0,
    "https://example.com/2023/12/post": 0.9,
    "https://example.com/2022/post": 0.8,
    "https://example.com/no-date": 0.5,
}

DOMAIN_GOLDENS = {  # {'python.org':1.0,'github.com':0.8,'medium.com':0.6} default 0.3
    "https://python.org/about": 1.0,
    "https://github.com/repo": 0.8,
    "https://medium.com/post": 0.6,
    "https://unknown.com": 0.3,
}

COMPOSITE_GOLDENS = {  # all five above, normalize=True
    "https://python.org/blog/2024/01/new-release.html": 0.86666667,
    "https://github.com/repo/old-code.pdf": 0.62,
    "https://unknown.com/random": 0.26,
}


def test_keyword_scorer(spark):
    got = score_all(
        spark, KEYWORD_GOLDENS, S.keyword_relevance_score("url", ["python", "blog"])
    )
    for u, exp in KEYWORD_GOLDENS.items():
        assert got[u] == pytest.approx(exp, abs=TOL), u


def test_path_depth_scorer(spark):
    got = score_all(spark, PATH_DEPTH_GOLDENS, S.path_depth_score("url", optimal_depth=2))
    for u, exp in PATH_DEPTH_GOLDENS.items():
        assert got[u] == pytest.approx(exp, abs=TOL), u


def test_content_type_scorer(spark):
    weights = {".html$": 1.0, ".pdf$": 0.8, ".jpg$": 0.6}
    got = score_all(spark, CONTENT_TYPE_GOLDENS, S.content_type_score("url", weights))
    for u, exp in CONTENT_TYPE_GOLDENS.items():
        assert got[u] == pytest.approx(exp, abs=TOL), u


def test_freshness_scorer(spark):
    got = score_all(spark, FRESHNESS_GOLDENS, S.freshness_score("url", current_year=2024))
    for u, exp in FRESHNESS_GOLDENS.items():
        assert got[u] == pytest.approx(exp, abs=TOL), u
    # fallback arithmetic for old years: 2014 → max(0.1, 1-10*0.1)=0.1
    extra = score_all(
        spark,
        ["https://e.com/2014/x", "https://e.com/2017/x"],
        S.freshness_score("url", current_year=2024),
    )
    assert extra["https://e.com/2014/x"] == pytest.approx(0.1, abs=TOL)
    assert extra["https://e.com/2017/x"] == pytest.approx(0.3, abs=TOL)


def test_domain_authority_scorer(spark):
    weights = {"python.org": 1.0, "github.com": 0.8, "medium.com": 0.6}
    got = score_all(
        spark, DOMAIN_GOLDENS, S.domain_authority_score("url", weights, default_weight=0.3)
    )
    for u, exp in DOMAIN_GOLDENS.items():
        assert got[u] == pytest.approx(exp, abs=TOL), u


def test_composite_scorer(spark):
    parts = [
        S.keyword_relevance_score("url", ["python", "blog"]),
        S.path_depth_score("url", optimal_depth=2),
        S.content_type_score("url", {".html$": 1.0, ".pdf$": 0.8, ".jpg$": 0.6}),
        S.freshness_score("url", current_year=2024),
        S.domain_authority_score(
            "url", {"python.org": 1.0, "github.com": 0.8, "medium.com": 0.6}, default_weight=0.3
        ),
    ]
    got = score_all(spark, COMPOSITE_GOLDENS, S.composite_score(parts, normalize=True))
    for u, exp in COMPOSITE_GOLDENS.items():
        assert got[u] == pytest.approx(exp, abs=TOL), u


def test_scorers_stay_native(spark):
    """No BatchEvalPython / ArrowEvalPython in the plan — scoring must
    stay inside whole-stage codegen."""
    df = spark.createDataFrame([("https://a.com/x",)], ["url"]).withColumn(
        "s",
        S.composite_score(
            [
                S.keyword_relevance_score("url", ["a"]),
                S.path_depth_score("url"),
                S.freshness_score("url"),
            ]
        ),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
