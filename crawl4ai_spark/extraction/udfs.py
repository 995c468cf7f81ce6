"""Arrow-batched extraction UDF: (url, html) → scrape+markdown+spans.

One vectorized pandas UDF covers the reference's scrape→markdownify
stages (E1-E4 in SURVEY.md §2.8) in a single Python hop per row batch —
the two-UDF split of the reference (scrape then markdownify) would pay
Arrow serialization twice for the same HTML, so we fuse them.  Batch
size is governed by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from crawl4ai_spark.extraction.htmlparse import extract_page
from crawl4ai_spark.extraction.markdown import convert_links_to_citations

EXTRACT_RESULT = StructType(
    [
        StructField("success", BooleanType()),
        StructField("metadata", MapType(StringType(), StringType())),
        StructField(
            "links",
            ArrayType(
                StructType(
                    [
                        StructField("href", StringType()),
                        StructField("text", StringType()),
                        StructField("title", StringType()),
                        StructField("internal", BooleanType()),
                    ]
                )
            ),
        ),
        StructField(
            "media",
            ArrayType(
                StructType(
                    [
                        StructField("src", StringType()),
                        StructField("alt", StringType()),
                        StructField("media_type", StringType()),
                        StructField("score", IntegerType()),
                        StructField("group_id", IntegerType()),
                    ]
                )
            ),
        ),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
        StructField("raw_markdown", StringType()),
        StructField("markdown_with_citations", StringType()),
        StructField("references_markdown", StringType()),
    ]
)


def extract_one(url: str, html: str, markdown_dialect: str = "house") -> dict:
    """Pure-Python single-page extraction → plain dict matching
    EXTRACT_RESULT.  Shared with the parity simulator.

    markdown_dialect (E4):
    - "house" (default): the span walker's dialect — the parity-pinned
      surface the interleaved-span pipeline is defined on.
    - "html2text": the markdown fields follow the reference's
      html2text conventions (extraction.html2md — the reference runs
      its vendored html2text fork with body_width=0,
      single_line_break=True, mark_code=True,
      markdown_generation_strategy.py:180-214).  Spans/links/media are
      IDENTICAL in both dialects; only raw_markdown and its citation
      derivatives change.
    """
    if html is None:
        return {
            "success": False, "metadata": {}, "links": [], "media": [],
            "spans": [], "raw_markdown": "", "markdown_with_citations": "",
            "references_markdown": "",
        }
    page = extract_page(url, html)
    if markdown_dialect == "html2text":
        from crawl4ai_spark.extraction.html2md import html_to_markdown

        raw_md = html_to_markdown(html)
    else:
        raw_md = page.raw_markdown
    cited, refs = convert_links_to_citations(raw_md, url)
    return {
        "success": True,
        "metadata": page.metadata,
        "links": [
            {"href": l.href, "text": l.text, "title": l.title, "internal": l.internal}
            for l in page.links
        ],
        "media": [
            {"src": m.src, "alt": m.alt, "media_type": m.media_type,
             "score": m.score, "group_id": m.group_id}
            for m in page.media
        ],
        "spans": [
            {"kind": k, "text": t, "media_ref": r, "offset": o}
            for (k, t, r, o) in page.spans
        ],
        "raw_markdown": raw_md,
        "markdown_with_citations": cited,
        "references_markdown": refs,
    }


def make_extract_udf(markdown_dialect: str = "house"):
    """Extraction UDF factory — dialect baked into the closure so the
    hot loop stays a single fused Arrow hop."""

    @pandas_udf(EXTRACT_RESULT)
    def _extract_udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
        rows = [extract_one(u, h, markdown_dialect) for u, h in zip(url, html)]
        return pd.DataFrame(rows)

    return _extract_udf


extract_udf = make_extract_udf()
