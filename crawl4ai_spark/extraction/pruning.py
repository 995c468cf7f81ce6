"""Pruning content filter (E5) — fit_markdown.

Clean-room re-expression of the reference's PruningContentFilter
(/root/reference/crawl4ai/content_filter_strategy.py:533-777):
bottom-up tree walk scoring each element on a weighted composite —

    0.4·text_density + 0.2·(1 − link_density) + 0.2·tag_weight
    + 0.1·class_id_weight + 0.1·log(text_len + 1) normalized

— and removing subtrees below the threshold (fixed 0.48 by default).
The surviving tree renders through the same span walker as the main
extractor, so `fit_markdown`/`fit_spans` have identical structure to
raw markdown, just with boilerplate (nav/footer/ad-shaped nodes)
pruned away.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import StringType

from crawl4ai_spark.extraction.htmlparse import (
    HEADING_TAGS, Node, _Walker, parse_html,
)

# tag importance weights in the spirit of the reference's tag_importance
# (content_filter_strategy.py:~600): content tags up, chrome tags down.
TAG_WEIGHTS: dict[str, float] = {
    "article": 1.0, "main": 1.0, "section": 0.8, "p": 0.9,
    "h1": 1.0, "h2": 0.9, "h3": 0.8, "h4": 0.7, "h5": 0.7, "h6": 0.7,
    "blockquote": 0.8, "pre": 0.8, "table": 0.7, "ul": 0.6, "ol": 0.6,
    "div": 0.5, "span": 0.5,
    "nav": 0.1, "footer": 0.1, "header": 0.2, "aside": 0.2, "form": 0.1,
}
_NEGATIVE_HINTS = ("nav", "menu", "footer", "sidebar", "ad", "banner",
                   "cookie", "popup", "social", "share", "comment")
_POSITIVE_HINTS = ("content", "article", "main", "body", "post", "text")


def _element_stats(node: Node) -> tuple[int, int]:
    """(total_text_len, link_text_len) of a subtree."""
    if node.tag == "#text":
        return len(node.text.strip()), 0
    total, link = 0, 0
    for c in node.children:
        t, l = _element_stats(c)
        total += t
        link += l
    if node.tag == "a":
        link = total
    return total, link


def _class_id_weight(node: Node) -> float:
    blob = (node.attrs.get("class", "") + " " + node.attrs.get("id", "")).lower()
    score = 0.5
    if any(h in blob for h in _POSITIVE_HINTS):
        score += 0.4
    if any(h in blob for h in _NEGATIVE_HINTS):
        score -= 0.4
    return max(0.0, min(1.0, score))


def score_element(node: Node) -> float:
    """Composite prune score in [0,1] (content_filter_strategy.py:645-700
    weighting)."""
    text_len, link_len = _element_stats(node)
    if text_len == 0:
        return 0.0
    n_children = max(1, len([c for c in node.children if c.tag != "#text"]))
    text_density = min(1.0, text_len / (n_children * 80.0))
    link_density = (link_len / text_len) if text_len else 1.0
    tag_weight = TAG_WEIGHTS.get(node.tag, 0.5)
    len_score = min(1.0, math.log(text_len + 1) / math.log(1000))
    return (
        0.4 * text_density
        + 0.2 * (1.0 - link_density)
        + 0.2 * tag_weight
        + 0.1 * _class_id_weight(node)
        + 0.1 * len_score
    )


_PRUNABLE = {"div", "section", "aside", "nav", "footer", "header", "ul", "ol",
             "table", "form", "span"} | set(HEADING_TAGS) | {"p", "blockquote"}


def prune_tree(node: Node, threshold: float = 0.48) -> None:
    """Bottom-up prune: children first, then drop any prunable child
    whose composite score falls below the threshold."""
    for c in node.children:
        if c.tag != "#text":
            prune_tree(c, threshold)
    kept = []
    for c in node.children:
        if c.tag != "#text" and c.tag in _PRUNABLE:
            if score_element(c) < threshold:
                continue
        kept.append(c)
    node.children = kept


def fit_spans(url: str, html: str, threshold: float = 0.48):
    """Parse → prune → walk: the fit (boilerplate-removed) span
    sequence and markdown for one page."""
    root = parse_html(html or "")
    body = next(root.find_all("body"), root)
    prune_tree(body, threshold)
    walker = _Walker()
    walker.walk(body)
    spans = [
        (b.kind, b.text if b.kind == "text" else "",
         b.media_ref if b.kind == "media" else "", i)
        for i, b in enumerate(walker.blocks)
    ]
    md_parts = [
        b.text if b.kind == "text" else f"![{b.media_alt}]({b.media_ref})"
        for b in walker.blocks
    ]
    return spans, "\n\n".join(md_parts)


def make_fit_markdown_udf(threshold: float = 0.48):
    @pandas_udf(StringType())
    def fit_markdown_udf(url: pd.Series, html: pd.Series) -> pd.Series:
        return pd.Series(
            [fit_spans(u, h, threshold)[1] if isinstance(h, str) else ""
             for u, h in zip(url, html)],
            dtype=object,
        )

    return fit_markdown_udf
