"""BM25 content filter (E6) + fit_html preprocess (E8).

Clean-room re-expression of:
- BM25ContentFilter (/root/reference/crawl4ai/content_filter_strategy
  .py:381-530): page query from user query else title + first h1 +
  meta keywords/description else first long paragraph (:125-159);
  block-level text chunks; BM25Okapi over the page's OWN chunks with
  stopword-cleaned whitespace tokens (no stemmer in this container →
  use_stemming=False semantics); per-chunk score × priority-tag
  weight (:426-437); threshold cut; document-order output of cleaned
  chunk HTML (:329-360: script/style/aside/form/iframe/noscript and
  style/on*/align/bgcolor/class/id attrs dropped).
- preprocess_html_for_schema (/root/reference/crawl4ai/utils.py
  :2883-2980): drop <head> and media/script tags, truncate long text
  nodes and attribute values, cap output size — the fit_html input
  for schema generation.

Spark surface: one Arrow UDF per page batch (`make_bm25_fit_udf`);
the BM25 corpus is per-page (its own chunks), so rows are
independent — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import math
import re

import pandas as pd  # module-level: pyspark resolves the UDF's string
# annotations ('pd.Series') against this module's globals under
# `from __future__ import annotations`.

from crawl4ai_spark.extraction.htmlparse import Node, parse_html

__all__ = [
    "page_query", "text_chunks", "bm25_filter_chunks",
    "fit_html_preprocess", "make_bm25_fit_udf",
]

PRIORITY_TAGS = {
    "h1": 5.0, "h2": 4.0, "h3": 3.0, "title": 4.0, "strong": 2.0,
    "b": 1.5, "em": 1.5, "blockquote": 2.0, "code": 2.0, "pre": 1.5,
    "th": 1.5,
}

_CHUNK_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6", "header", "p", "li",
               "blockquote", "pre", "td", "th", "figcaption", "dd", "dt"}

# minimal english stopword set (clean_tokens semantics: drop stop
# words, noise glyphs, tokens ≤ 2 chars — utils.py:2425-2470)
_STOP = {
    "the", "and", "for", "are", "was", "with", "that", "this", "from",
    "you", "your", "has", "have", "had", "not", "but", "its", "can",
    "all", "will", "one", "our", "out", "they", "their", "them",
}


def _tokens(text: str) -> list[str]:
    toks = (text or "").lower().split()
    return [t for t in toks if len(t) > 2 and t not in _STOP
            and not t.startswith(("↑", "▲", "©"))]


def page_query(root: Node, user_query: str | None = None) -> str:
    """Query fallback chain (content_filter_strategy.py:125-159)."""
    if user_query:
        return user_query
    parts: list[str] = []
    for t in root.find_all("title"):
        txt = " ".join(t.iter_text().split())
        if txt:
            parts.append(txt)
        break
    for h in root.find_all("h1"):
        txt = " ".join(h.iter_text().split())
        if txt:
            parts.append(txt)
        break
    had_meta = False
    for holder in root.children:
        if holder.tag == "#removed-meta":
            name = (holder.attrs.get("name") or "").lower()
            content = holder.attrs.get("content", "")
            if name in ("keywords", "description") and content:
                parts.append(content)
                had_meta = True
    if not had_meta:
        for p in root.find_all("p"):
            txt = " ".join(p.iter_text().split())
            if len(txt) > 150:
                parts.append(txt[:150])
                break
    return " ".join(parts)


def text_chunks(root: Node) -> list[tuple[int, str, str, Node]]:
    """(index, text, tag_name, node) per block chunk, document order.
    Innermost chunk tags win (an li inside a blockquote chunks as the
    li), mirroring the reference's block/inline split."""
    out: list[tuple[int, str, str, Node]] = []

    def walk(node: Node) -> None:
        for c in node.children:
            if c.tag.startswith("#"):
                continue
            has_block_child = any(
                g.tag in _CHUNK_TAGS for g in _descend(c)
            )
            if c.tag in _CHUNK_TAGS and not has_block_child:
                txt = " ".join(c.iter_text().split())
                if txt:
                    out.append((len(out), txt, c.tag, c))
                continue
            walk(c)

    def _descend(n: Node):
        for c in n.children:
            if not c.tag.startswith("#"):
                yield c
                yield from _descend(c)

    walk(root)
    return out


_UNWANTED_TAGS = {"script", "style", "aside", "form", "iframe", "noscript"}
_UNWANTED_ATTRS = {"style", "onclick", "onmouseover", "align", "bgcolor",
                   "class", "id"}


def _clean_html(node: Node) -> str:
    if node.tag == "#text":
        return node.text
    if node.tag in _UNWANTED_TAGS or node.tag.startswith("#"):
        return ""
    attrs = "".join(
        f' {k}="{v}"' for k, v in node.attrs.items()
        if k not in _UNWANTED_ATTRS and not k.startswith("on")
    )
    inner = "".join(_clean_html(c) for c in node.children)
    return f"<{node.tag}{attrs}>{inner}</{node.tag}>"


def bm25_filter_chunks(
    html: str, user_query: str | None = None, threshold: float = 1.0,
    min_word_threshold: int | None = None,
) -> list[str]:
    """Per-page BM25 chunk filter → cleaned chunk HTML in document
    order (the reference's filter_content contract)."""
    if not html or not isinstance(html, str):
        return []
    root = parse_html(html)
    query = page_query(root, user_query)
    if not query:
        return []
    chunks = text_chunks(root)
    if min_word_threshold:
        chunks = [c for c in chunks if len(c[1].split()) >= min_word_threshold]
    if not chunks:
        return []
    corpus = [_tokens(text) for _, text, _, _ in chunks]
    q_tokens = _tokens(query)
    n = len(corpus)
    avgdl = sum(len(d) for d in corpus) / n if n else 1.0
    df: dict[str, int] = {}
    for d in corpus:
        for t in set(d):
            df[t] = df.get(t, 0) + 1
    k1, b = 1.5, 0.75

    def score(d: list[str]) -> float:
        s = 0.0
        dl = len(d)
        for t in set(q_tokens):
            tf = d.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5) + 1)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / (avgdl or 1.0)))
        return s

    selected = []
    for (idx, text, tag, node), d in zip(chunks, corpus):
        weight = PRIORITY_TAGS.get(tag, 1.0)
        if score(d) * weight >= threshold:
            selected.append((idx, node))
    selected.sort(key=lambda x: x[0])
    return [_clean_html(node) for _, node in selected]


def fit_html_preprocess(
    html: str, text_threshold: int = 100, attr_value_threshold: int = 200,
    max_size: int = 100_000,
) -> str:
    """Schema-generation preprocessing (utils.py:2883-2980): body
    only, media/script tags dropped, long text and attribute values
    truncated, output capped at max_size."""
    if not html:
        return ""
    root = parse_html(html)
    drop = {"script", "style", "noscript", "iframe", "canvas", "svg",
            "video", "audio", "source", "track", "map", "area", "head",
            "meta", "link"}

    def render(node: Node) -> str:
        if node.tag == "#text":
            t = node.text
            return t[:text_threshold] + "..." if len(t) > text_threshold else t
        if node.tag == "#root":
            return "".join(render(c) for c in node.children)
        if node.tag in drop or node.tag.startswith("#"):
            return ""
        attrs = "".join(
            ' {}="{}"'.format(
                k, (v[:attr_value_threshold] + "...") if len(v) > attr_value_threshold else v
            )
            for k, v in node.attrs.items()
        )
        inner = "".join(render(c) for c in node.children)
        return f"<{node.tag}{attrs}>{inner}</{node.tag}>"

    out = render(root)
    return out[:max_size]


def make_bm25_fit_udf(user_query: str | None = None, threshold: float = 1.0):
    """(url, html) → struct(fit_html, fit_markdown): the reference's
    fit pipeline — filtered chunks wrapped in <div>s, then markdown
    (markdown_generation_strategy.py:231-243)."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import StringType, StructField, StructType

    from crawl4ai_spark.extraction.html2md import html_to_markdown

    schema = StructType([
        StructField("fit_html", StringType()),
        StructField("fit_markdown", StringType()),
    ])

    @pandas_udf(schema)
    def udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
        rows = []
        for _u, h in zip(url, html):
            chunks = bm25_filter_chunks(h if isinstance(h, str) else "", user_query, threshold)
            fit_html = "\n".join(f"<div>{c}</div>" for c in chunks)
            rows.append({
                "fit_html": fit_html,
                "fit_markdown": html_to_markdown(fit_html) if fit_html else "",
            })
        return pd.DataFrame(rows)

    return udf
