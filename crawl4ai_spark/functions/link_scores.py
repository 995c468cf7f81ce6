"""Link intrinsic / contextual / total scoring (R7, R9) + link
preview selection (O7, O8, J6) — native Column expressions.

Clean-room re-expression of the reference's link-quality scoring
(behavioral spec: /root/reference/crawl4ai/utils.py:3098-3304 —
extract_page_context, calculate_link_intrinsic_score,
calculate_total_score; selection/sort:
/root/reference/crawl4ai/link_preview.py:120-175, 380-390).

Everything here is JVM-side (whole-stage codegen): attribute checks
are string predicates, the term-overlap component is
array_intersect over tokenized term arrays, and the total-score blend
is arithmetic.  A Python mirror (`*_py`) of the intrinsic scorer
lives alongside for golden tests — both restate the same published
rules; the tests assert they agree on a case battery.

Scale: per-link scoring is a projection (no shuffle); the page-term
array is computed once per page and carried through the link explode,
exactly like the reference computes page_context once per page.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "page_terms",
    "is_docs_site",
    "link_intrinsic_score",
    "link_total_score",
    "link_intrinsic_score_py",
    "link_total_score_py",
    "score_links",
]

_PUNCT_RE = r'^[.,!?;:"()\[\]{}]+|[.,!?;:"()\[\]{}]+$'

_NAV_CLASSES = ["nav", "menu", "primary", "main", "important"]
_BAD_CLASSES = ["ad", "sponsor", "track", "promo", "banner"]
_GOOD_RELS = ["canonical", "next", "prev", "chapter"]
_BAD_RELS = ["nofollow", "sponsored", "ugc"]
_GOOD_PATHS = ["/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/"]
_MEDIUM_PATHS = ["/blog/", "/article/", "/post/", "/news/"]
_BAD_PATHS = ["/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/"]
_GENERIC_TEXTS = ["click here", "read more", "more info", "link", "here"]
_DOCS_DOMAINS = ["docs.", "api.", "developer.", "reference."]
_DOCS_KEYWORDS = ["api", "reference", "guide", "tutorial", "example"]


def _tokens(text: Column) -> Column:
    """Distinct lowercased words, punctuation-stripped, length > 2 —
    the reference's term-set tokenization (utils.py:3129-3134)."""
    words = F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+")
    stripped = F.transform(words, lambda w: F.regexp_replace(w, _PUNCT_RE, ""))
    return F.array_distinct(F.filter(stripped, lambda w: F.length(w) > 2))


def page_terms(title: Column, headlines: Column, meta_description: Column) -> Column:
    """Per-page context term array — computed ONCE per page
    (extract_page_context semantics)."""
    all_text = F.concat_ws(
        " ",
        F.coalesce(title, F.lit("")),
        F.coalesce(headlines, F.lit("")),
        F.coalesce(meta_description, F.lit("")),
    )
    return _tokens(all_text)


def is_docs_site(base_url: Column) -> Column:
    """Domain carries a docs./api./developer./reference. label."""
    domain = F.lower(F.regexp_extract(base_url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1))
    cond = F.lit(False)
    for ind in _DOCS_DOMAINS:
        cond = cond | F.contains(domain, F.lit(ind))
    return cond


def _contains_any(col: Column, needles: list[str]) -> Column:
    cond = F.lit(False)
    for n in needles:
        cond = cond | F.contains(col, F.lit(n))
    return cond


def link_intrinsic_score(
    link_text: Column,
    url: Column,
    title_attr: Column,
    class_attr: Column,
    rel_attr: Column,
    terms: Column,
    docs_site: Column,
) -> Column:
    """0-10 intrinsic link quality (utils.py:3143-3255), clamped."""
    text = F.coalesce(link_text, F.lit(""))
    u = F.coalesce(url, F.lit(""))
    url_lower = F.lower(u)
    class_str = F.lower(F.coalesce(class_attr, F.lit("")))
    rel_str = F.lower(F.coalesce(rel_attr, F.lit("")))

    score = F.lit(0.0)
    # 1. attribute quality
    score = score + F.when(
        F.length(F.trim(F.coalesce(title_attr, F.lit("")))) > 3, 1.0
    ).otherwise(0.0)
    score = score + F.when(_contains_any(class_str, _NAV_CLASSES), 1.5).otherwise(0.0)
    score = score - F.when(_contains_any(class_str, _BAD_CLASSES), 1.0).otherwise(0.0)
    score = score + F.when(_contains_any(rel_str, _GOOD_RELS), 1.0).otherwise(0.0)
    score = score - F.when(_contains_any(rel_str, _BAD_RELS), 0.5).otherwise(0.0)
    # 2. URL structure (good paths elif medium paths; bad independent)
    score = score + (
        F.when(_contains_any(url_lower, _GOOD_PATHS), 2.0)
        .when(_contains_any(url_lower, _MEDIUM_PATHS), 1.0)
        .otherwise(0.0)
    )
    score = score - F.when(_contains_any(url_lower, _BAD_PATHS), 1.5).otherwise(0.0)
    url_depth = F.size(F.split(u, "/")) - 1 - 2
    score = score + F.when(url_depth <= 2, 1.0).when(url_depth > 5, -0.5).otherwise(0.0)
    score = score + F.when(u.startswith("https://"), 0.5).otherwise(0.0)
    # 3. text quality
    text_clean = F.trim(text)
    n_words = F.size(F.filter(F.split(text_clean, r"\s+"), lambda w: w != F.lit("")))
    score = score + F.when(F.length(text_clean) > 3, 1.0).otherwise(0.0)
    score = score + F.when(n_words >= 2, 0.5).otherwise(0.0)
    score = score + F.when(n_words >= 4, 0.5).otherwise(0.0)
    score = score - F.when(F.lower(text_clean).isin(_GENERIC_TEXTS), 1.0).otherwise(0.0)
    # 4. contextual term overlap (up to +2)
    link_words = _tokens(text)
    overlap = F.size(F.array_intersect(link_words, F.coalesce(terms, F.array())))
    ratio = overlap / F.least(F.size(link_words), F.lit(10)).cast("double")
    score = score + F.when(
        (F.size(link_words) > 0) & (overlap > 0) & (F.size(F.coalesce(terms, F.array())) > 0),
        ratio * 2.0,
    ).otherwise(0.0)
    # 5. docs-site bonus
    score = score + F.when(
        F.coalesce(docs_site, F.lit(False))
        & (F.length(text) > 0)
        & _contains_any(F.lower(text), _DOCS_KEYWORDS),
        1.0,
    ).otherwise(0.0)
    return F.greatest(F.lit(0.0), F.least(score, F.lit(10.0)))


def link_total_score(
    intrinsic: Column,
    contextual: Column,
    score_links_enabled: bool,
    query_provided: bool,
) -> Column:
    """Blend (utils.py:3258-3304): disabled → 5.0 neutral; intrinsic
    only → clamp(intrinsic); both → 0.7·intrinsic + 0.3·(contextual·10)."""
    if not score_links_enabled:
        return F.lit(5.0)
    i = F.coalesce(intrinsic, F.lit(0.0))
    if not query_provided:
        return F.greatest(F.lit(0.0), F.least(i, F.lit(10.0)))
    blended = i * 0.7 + F.least(F.coalesce(contextual, F.lit(0.0)) * 10.0, F.lit(10.0)) * 0.3
    only_intrinsic = F.greatest(F.lit(0.0), F.least(i, F.lit(10.0)))
    return F.when(contextual.isNull(), only_intrinsic).otherwise(
        F.greatest(F.lit(0.0), F.least(blended, F.lit(10.0)))
    )


# ── Python mirrors (golden tests + simulator reuse) ──────────────────

def _strip_punct(w: str) -> str:
    return w.strip('.,!?;:"()[]{}')


def _tokens_py(text: str) -> set[str]:
    return {
        _strip_punct(w).lower()
        for w in (text or "").lower().split()
        if len(_strip_punct(w)) > 2
    }


def link_intrinsic_score_py(
    link_text: str, url: str, title_attr: str, class_attr: str,
    rel_attr: str, terms: set[str], docs_site: bool,
) -> float:
    score = 0.0
    if title_attr and len(title_attr.strip()) > 3:
        score += 1.0
    class_str = (class_attr or "").lower()
    if any(c in class_str for c in _NAV_CLASSES):
        score += 1.5
    if any(c in class_str for c in _BAD_CLASSES):
        score -= 1.0
    rel_str = (rel_attr or "").lower()
    if any(r in rel_str for r in _GOOD_RELS):
        score += 1.0
    if any(r in rel_str for r in _BAD_RELS):
        score -= 0.5
    url_lower = (url or "").lower()
    if any(p in url_lower for p in _GOOD_PATHS):
        score += 2.0
    elif any(p in url_lower for p in _MEDIUM_PATHS):
        score += 1.0
    if any(p in url_lower for p in _BAD_PATHS):
        score -= 1.5
    url_depth = (url or "").count("/") - 2
    if url_depth <= 2:
        score += 1.0
    elif url_depth > 5:
        score -= 0.5
    if (url or "").startswith("https://"):
        score += 0.5
    if link_text:
        text_clean = link_text.strip()
        if len(text_clean) > 3:
            score += 1.0
        wc = len(text_clean.split())
        if wc >= 2:
            score += 0.5
        if wc >= 4:
            score += 0.5
        if text_clean.lower() in _GENERIC_TEXTS:
            score -= 1.0
    if terms and link_text:
        link_words = _tokens_py(link_text)
        if link_words:
            overlap = len(link_words & terms)
            if overlap > 0:
                score += (overlap / min(len(link_words), 10)) * 2.0
    if docs_site and link_text and any(k in link_text.lower() for k in _DOCS_KEYWORDS):
        score += 1.0
    return max(0.0, min(score, 10.0))


def link_total_score_py(
    intrinsic: float | None, contextual: float | None,
    score_links_enabled: bool, query_provided: bool,
) -> float:
    if not score_links_enabled:
        return 5.0
    i = intrinsic if intrinsic is not None else 0.0
    if not query_provided or contextual is None:
        return max(0.0, min(i, 10.0))
    total = i * 0.7 + min(contextual * 10.0, 10.0) * 0.3
    return max(0.0, min(total, 10.0))


# ── link preview selection (link_preview.py:120-175, 380-390) ────────

def score_links(
    links: DataFrame,
    head: DataFrame | None = None,
    *,
    score_links_enabled: bool = True,
    query_provided: bool | None = None,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
    max_links: int = 0,
    url_col: str = "url",
    page_col: str = "page_url",
) -> DataFrame:
    """Score one exploded link table.

    `links` columns: (page_col, url_col, text, title_attr, class_attr,
    rel_attr, page_title, headlines, meta_description) — page_* are
    the per-page context carried through the explode.
    `head` (optional, J6 head-data merge-back): (url, relevance_score)
    from the partial-<head> pipeline; broadcast-joined.

    Adds intrinsic_score, contextual_score, total_score; applies
    include/exclude globs and the per-page max_links head-cut (O8, a
    keyed window — the reference truncates the filtered list);
    orders within page by contextual relevance desc (O7) when head
    data exists, else document order.
    """
    from pyspark.sql import Window

    from crawl4ai_spark.functions.filters import url_pattern_filter  # reuse F9 glob

    df = links
    if include_patterns:
        df = df.filter(url_pattern_filter(F.col(url_col), include_patterns))
    if exclude_patterns:
        df = df.filter(~url_pattern_filter(F.col(url_col), exclude_patterns))
    if max_links and max_links > 0:
        w = Window.partitionBy(page_col).orderBy("link_pos")
        df = df.withColumn("_r", F.row_number().over(w)).filter(
            F.col("_r") <= max_links
        ).drop("_r")

    terms = page_terms(F.col("page_title"), F.col("headlines"), F.col("meta_description"))
    docs = is_docs_site(F.col(page_col))
    df = df.withColumn(
        "intrinsic_score",
        link_intrinsic_score(
            F.col("text"), F.col(url_col), F.col("title_attr"),
            F.col("class_attr"), F.col("rel_attr"), terms, docs,
        ),
    )
    if head is not None:
        df = df.join(
            F.broadcast(head.select(F.col("url").alias(url_col),
                                    F.col("relevance_score").alias("contextual_score"))),
            url_col, "left",
        )
    else:
        df = df.withColumn("contextual_score", F.lit(None).cast("double"))
    if query_provided is None:
        query_provided = head is not None
    df = df.withColumn(
        "total_score",
        link_total_score(
            F.col("intrinsic_score"), F.col("contextual_score"),
            score_links_enabled, query_provided,
        ),
    )
    return df
