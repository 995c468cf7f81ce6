"""Structured table extraction (E9): HTML → {headers, rows, caption}.

Clean-room re-expression of the reference's DefaultTableExtraction
(/root/reference/crawl4ai/table_extraction.py:21-120): each <table>
is scored (headers present, row count, cell-count consistency,
caption/summary) and kept above a threshold; output is the structured
headers/rows shape, not markdown.  Runs as one Arrow UDF over the
page HTML (shares the lenient parser with the main extractor).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from crawl4ai_spark.extraction.htmlparse import Node, parse_html

TABLE = StructType([
    StructField("caption", StringType()),
    StructField("headers", ArrayType(StringType())),
    StructField("rows", ArrayType(ArrayType(StringType()))),
    StructField("score", IntegerType()),
])


def _cell_text(node: Node) -> str:
    return " ".join(node.iter_text().split())


def extract_tables_py(html: str, score_threshold: int = 5) -> list[dict]:
    """Pure-Python single-page table extraction."""
    root = parse_html(html or "")
    out = []
    for table in root.find_all("table"):
        caption = ""
        for cap in table.find_all("caption"):
            caption = _cell_text(cap)
            break
        headers: list[str] = []
        rows: list[list[str]] = []
        for tr in table.find_all("tr"):
            cells = [c for c in tr.children if c.tag in ("td", "th")]
            if not cells:
                continue
            texts = [_cell_text(c) for c in cells]
            if not headers and any(c.tag == "th" for c in cells):
                headers = texts
            else:
                rows.append(texts)
        if not headers and rows:
            headers = rows.pop(0)
        # scoring in the spirit of table_extraction.py:66-120:
        # headers +2, ≥2 rows +2, consistent row width +2, caption +1,
        # ≥2 columns +2
        score = 0
        if headers:
            score += 2
        if len(rows) >= 2:
            score += 2
        if rows and all(len(r) == len(headers) for r in rows):
            score += 2
        if caption:
            score += 1
        if len(headers) >= 2:
            score += 2
        if score >= score_threshold:
            out.append({"caption": caption, "headers": headers,
                        "rows": rows, "score": score})
    return out


@pandas_udf(ArrayType(TABLE))
def extract_tables_udf(html: pd.Series) -> pd.Series:
    return pd.Series([extract_tables_py(h) for h in html], dtype=object)


def tables_from_pages(pages: DataFrame, html_col: str = "html",
                      id_col: str = "url") -> DataFrame:
    """(id, table_idx, caption, headers, rows, score) — one row per
    extracted table in document order."""
    return pages.select(
        F.col(id_col),
        F.posexplode(extract_tables_udf(F.col(html_col))).alias("table_idx", "t"),
    ).select(
        id_col, "table_idx",
        F.col("t.caption").alias("caption"),
        F.col("t.headers").alias("headers"),
        F.col("t.rows").alias("rows"),
        F.col("t.score").alias("score"),
    )
