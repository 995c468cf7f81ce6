"""Frontier-priority scorers as native Catalyst Column expressions.

Clean-room re-expressions of the reference scorers (behavioral spec:
/root/reference/crawl4ai/deep_crawling/scorers.py — KeywordRelevance
:160-188, PathDepth :190-245, ContentType :247-330, Freshness
:332-412, DomainAuthority :414-519, Composite :91-158).  Where the
reference runs per-URL Python with lru_cache, we compile each scorer
once into a Column expression tree so scoring stays inside
whole-stage codegen — zero Python per row, which is the entire point
at a 10^10-URL frontier.

Every compiler takes the Column holding the URL and returns a Column
of DoubleType.  `weight` multiplies the raw score exactly like
URLScorer.score (scorers.py:76-80).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "keyword_relevance_score",
    "path_depth",
    "path_depth_score",
    "content_type_score",
    "freshness_score",
    "domain_authority_score",
    "composite_score",
    "extract_domain",
    "extract_extension",
]

# PathDepthScorer distance lookup (scorers.py:14) and
# FreshnessScorer year-diff lookup (scorers.py:17-24).
_DEPTH_LOOKUP = [1.0, 0.5, 1.0 / 3.0, 0.25]
_FRESHNESS_LOOKUP = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]


def _col(url) -> Column:
    return F.col(url) if isinstance(url, str) else url


def keyword_relevance_score(
    url, keywords: list[str], *, weight: float = 1.0, case_sensitive: bool = False
) -> Column:
    """matches/len(keywords) where a match is a substring hit anywhere
    in the URL (scorers.py:175-188)."""
    u = _col(url)
    if not case_sensitive:
        u = F.lower(u)
        keywords = [k.lower() for k in keywords]
    hits = None
    for k in keywords:
        h = F.when(u.contains(k), F.lit(1)).otherwise(F.lit(0))
        hits = h if hits is None else hits + h
    if hits is None:
        return F.lit(0.0)
    return (hits.cast("double") / F.lit(float(len(keywords)))) * F.lit(weight)


def path_depth(url) -> Column:
    """Count of non-empty path segments after the authority.

    '' or '/' → 0, '/a' → 1, '/a/b/' → 2 (scorers.py:197-228).
    """
    u = _col(url)
    # Strip scheme+authority, then count non-empty '/'-separated segments.
    path = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    return F.when(path == "", F.lit(0)).otherwise(F.size(segs))


def path_depth_score(url, *, optimal_depth: int = 3, weight: float = 1.0) -> Column:
    """Lookup [1, .5, 1/3, .25] on |depth-optimal|, else 1/(1+dist)
    (scorers.py:230-245)."""
    dist = F.abs(path_depth(url) - F.lit(optimal_depth))
    expr = F.lit(1.0) / (F.lit(1.0) + dist.cast("double"))
    for d in range(len(_DEPTH_LOOKUP) - 1, -1, -1):
        expr = F.when(dist == d, F.lit(_DEPTH_LOOKUP[d])).otherwise(expr)
    return expr * F.lit(weight)


def extract_extension(url) -> Column:
    """Trailing alphanumeric run after the last '.', cut at the first
    non-alphanumeric (query/fragment/path-param) — ContentTypeScorer
    _quick_extension semantics (scorers.py:272-302)."""
    u = _col(url)
    return F.lower(F.regexp_extract(u, r"\.([A-Za-z0-9]+)[^.]*$", 1))


def content_type_score(url, type_weights: dict[str, float], *, weight: float = 1.0) -> Column:
    """Extension → weight map with regex fallback for non-'.ext$'
    patterns, 0.0 when nothing matches (scorers.py:250-330)."""
    u = _col(url)
    exact: dict[str, float] = {}
    regex: list[tuple[str, float]] = []
    for pattern, score in type_weights.items():
        if pattern.startswith(".") and pattern.endswith("$"):
            exact[pattern[1:-1].lower()] = score
        else:
            regex.append((pattern, score))
    regex.sort(key=lambda kv: -kv[1])  # highest score wins first, like the reference

    expr: Column = F.lit(0.0)
    # Regex fallbacks are checked after the exact map misses → build inside-out.
    for pattern, score in reversed(regex):
        expr = F.when(u.rlike(pattern), F.lit(score)).otherwise(expr)
    if exact:
        ext = extract_extension(u)
        mapped: Column = expr
        for e, score in exact.items():
            mapped = F.when(ext == e, F.lit(score)).otherwise(mapped)
        expr = mapped
    return expr * F.lit(weight)


def freshness_score(url, *, current_year: int = 2024, weight: float = 1.0) -> Column:
    """Latest year (1900-2099, ≤ current_year) found after a /, -, or _
    separator; lookup [1.0..0.5] by age, else max(0.1, 1-0.1·diff);
    no year → 0.5 (scorers.py:352-412)."""
    u = _col(url)
    years = F.transform(
        F.regexp_extract_all(u, F.lit(r"(?:/|[-_])((?:19|20)\d{2})"), 1),
        lambda y: y.cast("int"),
    )
    latest = F.array_max(F.filter(years, lambda y: y <= F.lit(current_year)))
    diff = F.lit(current_year) - latest
    expr = F.greatest(F.lit(0.1), F.lit(1.0) - diff.cast("double") * F.lit(0.1))
    for d in range(len(_FRESHNESS_LOOKUP) - 1, -1, -1):
        expr = F.when(diff == d, F.lit(_FRESHNESS_LOOKUP[d])).otherwise(expr)
    return F.when(latest.isNull(), F.lit(0.5)).otherwise(expr) * F.lit(weight)


def extract_domain(url) -> Column:
    """Lowercased authority without port; scheme optional
    (DomainAuthorityScorer._extract_domain, scorers.py:455-494)."""
    u = _col(url)
    dom = F.lower(F.regexp_extract(u, r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/?#]+)", 1))
    return F.regexp_replace(dom, r":[0-9]+$", "")


def domain_authority_score(
    url, domain_weights: dict[str, float], *, default_weight: float = 0.5, weight: float = 1.0
) -> Column:
    """Domain → authority weight with a default (scorers.py:417-519).

    Small maps compile to a when-chain (stays in codegen); for large
    authority tables use a broadcast join on `extract_domain` instead —
    this helper is the ≤O(100)-entry path.
    """
    dom = extract_domain(url)
    expr: Column = F.lit(default_weight)
    for d, score in domain_weights.items():
        expr = F.when(dom == d.lower(), F.lit(score)).otherwise(expr)
    return expr * F.lit(weight)


def composite_score(scores: list[Column], *, normalize: bool = True) -> Column:
    """Σ child scores (already weighted), ÷count when normalize —
    CompositeScorer semantics (scorers.py:116-145)."""
    if not scores:
        return F.lit(0.0)
    total = scores[0]
    for s in scores[1:]:
        total = total + s
    return total / F.lit(float(len(scores))) if normalize else total
