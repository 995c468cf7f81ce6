"""ContentRelevanceFilter (F6) and SEOFilter (F7) — native Columns.

Clean-room re-expression of the reference's head-section filters
(behavioral spec: /root/reference/crawl4ai/deep_crawling/filters.py
:501-573 ContentRelevanceFilter, :576-687 SEOFilter).  The reference
fetches the head per URL at filter time; the Spark shape decouples
that: the head pipeline (extraction.headparse / sources.sitemap)
produces (url, title, meta) columns, and these functions score them
as pure projections — no UDF, no shuffle, whole-stage codegen.

Quirks preserved exactly (they are the published semantics):
- the relevance "document" uses PYTHON STRING REPETITION for field
  weighting: title*3 / description*2 are concatenated with NO
  separator, so the title's last token merges with its first token
  on repeat (filters.py:539-547);
- the simplified IDF uses the term's own frequency, not document
  frequency: idf = ln(2/(tf+0.5)+1) (filters.py:562);
- a missing head (no title and no meta) fails both filters
  (filters.py:527,613).

Python mirrors (`*_py`) restate the same rules for golden tests and
the seeding simulator.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "relevance_doc",
    "content_relevance_score",
    "content_relevance_filter",
    "seo_score",
    "seo_filter",
    "content_relevance_score_py",
    "seo_score_py",
    "SEO_DEFAULT_WEIGHTS",
]

SEO_DEFAULT_WEIGHTS = {
    "title_length": 0.15,
    "title_kw": 0.18,
    "meta_description": 0.12,
    "canonical": 0.10,
    "robot_ok": 0.20,
    "schema_org": 0.10,
    "url_quality": 0.15,
}


def _meta(meta_map: Column, key: str) -> Column:
    return F.coalesce(F.element_at(meta_map, key), F.lit(""))


def relevance_doc(title: Column, meta_map: Column) -> Column:
    """The weighted head document (filters.py:539-547): ' '.join([
    title*3, description*2, keywords, ' '.join(meta.values())])."""
    t = F.coalesce(title, F.lit(""))
    desc = _meta(meta_map, "description")
    kw = _meta(meta_map, "keywords")
    all_meta = F.coalesce(
        F.array_join(F.map_values(F.coalesce(meta_map, F.map_from_arrays(F.array(), F.array()))), " "),
        F.lit(""),
    )
    return F.concat_ws(
        " ", F.repeat(t, 3), F.repeat(desc, 2), kw, all_meta
    )


def _tokens_ws(doc: Column) -> Column:
    """str.split() semantics: whitespace split, empties dropped."""
    return F.filter(F.split(F.lower(doc), r"\s+"), lambda w: w != F.lit(""))


def content_relevance_score(
    title: Column, meta_map: Column, query: str,
    k1: float = 1.2, b: float = 0.75, avgdl: int = 1000,
) -> Column:
    """BM25-with-simplified-IDF over the weighted head doc
    (filters.py:556-573)."""
    q_terms = sorted(set((query or "").lower().split()))
    toks = _tokens_ws(relevance_doc(title, meta_map))
    dl = F.size(toks).cast("double")
    score = F.lit(0.0)
    for term in q_terms:
        tf = F.size(F.filter(toks, lambda w: w == F.lit(term))).cast("double")
        idf = F.log((1.0 + 1.0) / (tf + 0.5) + 1.0)
        denom = tf + k1 * (1.0 - b + b * (dl / float(avgdl)))
        score = score + idf * (tf * (k1 + 1.0)) / denom
    return score


def content_relevance_filter(
    title: Column, meta_map: Column, query: str, threshold: float,
    k1: float = 1.2, b: float = 0.75, avgdl: int = 1000,
) -> Column:
    """True ⇔ head exists and BM25 score ≥ threshold."""
    has_head = (F.length(F.coalesce(title, F.lit(""))) > 0) | (
        F.size(F.coalesce(F.map_keys(meta_map), F.array())) > 0
    )
    return has_head & (
        content_relevance_score(title, meta_map, query, k1, b, avgdl)
        >= F.lit(float(threshold))
    )


# ── SEOFilter (filters.py:576-687) ───────────────────────────────────

def _score_title_length(title: Column) -> Column:
    n = F.length(F.coalesce(title, F.lit("")))
    return (
        F.when((n >= 50) & (n <= 60), 1.0)
        .when(((n >= 40) & (n < 50)) | ((n > 60) & (n <= 70)), 0.7)
        .otherwise(0.3)
    )


def _score_keyword_presence(title: Column, keywords: list[str] | None) -> Column:
    if not keywords:
        return F.lit(0.0)
    pat = r"(?i)\b({})\b".format("|".join(re.escape(k) for k in keywords))
    n = F.size(F.regexp_extract_all(F.coalesce(title, F.lit("")), F.lit(pat), 1))
    return F.least(n * F.lit(0.3), F.lit(1.0))


def _score_meta_description(desc: Column) -> Column:
    n = F.length(desc)
    return (
        F.when((n >= 140) & (n <= 160), 1.0)
        .when((n >= 120) & (n <= 200), 0.5)
        .otherwise(0.2)
    )


def _score_canonical(canonical: Column, url: Column) -> Column:
    return (
        F.when(F.length(F.coalesce(canonical, F.lit(""))) == 0, 0.5)
        .when(canonical == url, 1.0)
        .otherwise(0.2)
    )


def _score_url_quality(url: Column) -> Column:
    path = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1))
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    score = F.lit(1.0)
    score = score * F.when(F.length(path) > 80, 0.7).otherwise(1.0)
    score = score * F.when(path.rlike(r"\d{4}"), 0.8).otherwise(1.0)
    score = score * F.when(F.length(query) > 0, 0.6).otherwise(1.0)
    score = score * F.when(F.contains(path, F.lit("_")), 0.9).otherwise(1.0)
    return score


def seo_score(
    url: Column, title: Column, meta_map: Column, head_html: Column,
    keywords: list[str] | None = None,
    weights: dict[str, float] | None = None,
) -> Column:
    """Weighted SEO quality in [0,1] (filters.py:611-640).  The
    canonical URL comes from meta['canonical'] (link-rel canonical is
    merged into the meta map by the head parser when present)."""
    w = weights or SEO_DEFAULT_WEIGHTS
    desc = _meta(meta_map, "description")
    robots = _meta(meta_map, "robots")
    canonical = F.element_at(meta_map, "canonical")
    schema_org = F.when(
        F.coalesce(head_html, F.lit("")).rlike(
            r"<script[^>]+type=[\"']application/ld\+json"
        ),
        1.0,
    ).otherwise(0.0)
    factors = {
        "title_length": _score_title_length(title),
        "title_kw": _score_keyword_presence(title, keywords),
        "meta_description": _score_meta_description(desc),
        "canonical": _score_canonical(canonical, url),
        "robot_ok": F.when(F.contains(robots, F.lit("noindex")), 0.0).otherwise(1.0),
        "schema_org": schema_org,
        "url_quality": _score_url_quality(url),
    }
    total = F.lit(0.0)
    for name, weight in w.items():
        total = total + F.lit(float(weight)) * factors[name]
    return total


def seo_filter(
    url: Column, title: Column, meta_map: Column, head_html: Column,
    threshold: float = 0.65,
    keywords: list[str] | None = None,
    weights: dict[str, float] | None = None,
) -> Column:
    has_head = (F.length(F.coalesce(title, F.lit(""))) > 0) | (
        F.size(F.coalesce(F.map_keys(meta_map), F.array())) > 0
    )
    return has_head & (
        seo_score(url, title, meta_map, head_html, keywords, weights)
        >= F.lit(float(threshold))
    )


# ── Python mirrors ───────────────────────────────────────────────────

def content_relevance_score_py(
    title: str, meta: dict[str, str], query: str,
    k1: float = 1.2, b: float = 0.75, avgdl: int = 1000,
) -> float:
    doc = " ".join([
        (title or "") * 3,
        meta.get("description", "") * 2,
        meta.get("keywords", ""),
        " ".join(meta.values()),
    ])
    doc_terms = doc.lower().split()
    dl = len(doc_terms)
    score = 0.0
    for term in set((query or "").lower().split()):
        tf = doc_terms.count(term)
        idf = math.log((1 + 1) / (tf + 0.5) + 1)
        score += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    return score


def seo_score_py(
    url: str, title: str, meta: dict[str, str], head_html: str,
    keywords: list[str] | None = None,
    weights: dict[str, float] | None = None,
) -> float:
    from urllib.parse import urlparse

    w = weights or SEO_DEFAULT_WEIGHTS
    title = title or ""
    n = len(title)
    if 50 <= n <= 60:
        s_title = 1.0
    elif 40 <= n < 50 or 60 < n <= 70:
        s_title = 0.7
    else:
        s_title = 0.3
    if keywords:
        pat = re.compile(r"\b({})\b".format("|".join(map(re.escape, keywords))), re.I)
        s_kw = min(len(pat.findall(title)) * 0.3, 1.0)
    else:
        s_kw = 0.0
    d = len(meta.get("description", ""))
    s_desc = 1.0 if 140 <= d <= 160 else (0.5 if 120 <= d <= 200 else 0.2)
    canonical = meta.get("canonical")
    s_canon = 0.5 if not canonical else (1.0 if canonical == url else 0.2)
    s_robot = 1.0 if "noindex" not in meta.get("robots", "") else 0.0
    s_schema = 1.0 if re.search(r"<script[^>]+type=[\"']application/ld\+json", head_html or "") else 0.0
    p = urlparse(url)
    s_url = 1.0
    path = p.path.lower()
    if len(path) > 80:
        s_url *= 0.7
    if re.search(r"\d{4}", path):
        s_url *= 0.8
    if p.query:
        s_url *= 0.6
    if "_" in path:
        s_url *= 0.9
    factors = {
        "title_length": s_title, "title_kw": s_kw, "meta_description": s_desc,
        "canonical": s_canon, "robot_ok": s_robot, "schema_org": s_schema,
        "url_quality": s_url,
    }
    return sum(weight * factors[name] for name, weight in w.items())
