"""Partial-<head> parsing (E15) — the seeder's lightweight page probe.

Clean-room re-expression of the reference's `_parse_head`
(/root/reference/crawl4ai/async_url_seeder.py:89-159) and HeadPeekr
(utils.py:2826-2881): given the first N KB of a page (everything up
to </head>), extract title, meta name/property tags, link rels,
html lang, and raw JSON-LD blocks.  Used by the seeding pipeline to
score relevance without fetching full bodies.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, MapType, StringType, StructField, StructType,
)

from crawl4ai_spark.extraction.htmlparse import parse_html

HEAD_DATA = StructType([
    StructField("title", StringType()),
    StructField("lang", StringType()),
    StructField("meta", MapType(StringType(), StringType())),
    StructField("link_rels", MapType(StringType(), StringType())),
    StructField("jsonld", ArrayType(StringType())),
])


def truncate_to_head(html: str, max_bytes: int = 65536) -> str:
    """Stream-until-</head>-or-64KB semantics
    (async_url_seeder.py:1032-1140)."""
    if not html:
        return ""
    cut = html[:max_bytes]
    end = cut.lower().find("</head>")
    return cut[: end + 7] if end != -1 else cut


def parse_head_py(html: str) -> dict:
    frag = truncate_to_head(html or "")
    root = parse_html(frag)
    title = ""
    for t in root.find_all("title"):
        title = " ".join(t.iter_text().split())
        break
    lang = ""
    for h in root.find_all("html"):
        lang = h.attrs.get("lang", "")
        break
    meta: dict[str, str] = {}
    # the lenient parser routes removed <meta> tags to a side channel
    for holder in root.children:
        if holder.tag == "#removed-meta":
            name = (holder.attrs.get("name") or holder.attrs.get("property") or "").lower()
            content = holder.attrs.get("content", "")
            if name and content:
                meta.setdefault(name, content)
    link_rels: dict[str, str] = {}
    for holder in root.children:
        if holder.tag == "#removed-link":
            rel = (holder.attrs.get("rel") or "").lower()
            href = holder.attrs.get("href", "")
            if rel and href:
                link_rels.setdefault(rel, href)
    jsonld: list[str] = []
    # scripts are stripped by the content parser; scan the raw fragment
    low = frag.lower()
    pos = 0
    while True:
        start = low.find("application/ld+json", pos)
        if start == -1:
            break
        open_end = low.find(">", start)
        close = low.find("</script>", start)
        if open_end == -1 or close == -1:
            break
        jsonld.append(frag[open_end + 1 : close].strip())
        pos = close + 9
    if not title and "og:title" in meta:
        title = meta["og:title"]
    return {"title": title, "lang": lang, "meta": meta,
            "link_rels": link_rels, "jsonld": jsonld}


@pandas_udf(HEAD_DATA)
def parse_head_udf(html: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([parse_head_py(h) for h in html])


def head_text_for_scoring(head: dict) -> str:
    """Weighted head document for BM25 relevance: title×3 +
    description×2 + keywords (ContentRelevanceFilter semantics,
    filters.py:501-573)."""
    meta = head.get("meta", {})
    parts = [head.get("title", "")] * 3
    parts += [meta.get("description", "")] * 2
    parts.append(meta.get("keywords", ""))
    return " ".join(p for p in parts if p)
