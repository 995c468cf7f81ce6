"""Regex extraction (E12): labeled entity extraction over documents.

Clean-room re-expression of the reference's RegexExtractionStrategy
(/root/reference/crawl4ai/extraction_strategy.py:1706-1975): a catalog
of labeled patterns (email, url, ipv4/6, uuid, currency, %, number,
ISO/US dates, time, postal codes, hex color, @handle, hashtag, MAC,
IBAN, credit card) applied to page text, yielding
(doc, label, value[, span]).

Two paths:
- `regex_extract`: fully native — one `regexp_extract_all` + explode
  per requested label, unioned.  JVM regex, no Python, column-pruned;
  this is the 100 TB path.  (No character offsets — Spark's regexp
  functions don't expose match positions.)
- `regex_extract_with_spans`: Arrow UDF path that also returns
  [start, end) spans, matching the reference's output shape exactly.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The reference's DEFAULT_PATTERNS catalog (extraction_strategy.py:1783-1812)
# — shared regex facts; kept Java/RE2-compatible (no lookbehind).
DEFAULT_PATTERNS: dict[str, str] = {
    "email": r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "phone_intl": r"\+?\d[\d .()-]{7,}\d",
    "phone_us": r"\(?\d{3}\)?[ -. ]?\d{3}[ -. ]?\d{4}",
    "url": r"https?://[^\s\"'<>]+",
    "ipv4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "ipv6": r"[A-F0-9]{1,4}(?::[A-F0-9]{1,4}){7}",
    "uuid": r"[0-9a-f]{8}-[0-9a-f]{4}-[1-5][0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}",
    "currency": r"(?:USD|EUR|RM|\$|€|£)\s?\d+(?:[.,]\d{2})?",
    "percentage": r"\d+(?:\.\d+)?%",
    "number": r"\b\d{1,3}(?:[,.\s]\d{3})*(?:\.\d+)?\b",
    "date_iso": r"\d{4}-\d{2}-\d{2}",
    "date_us": r"\d{1,2}/\d{1,2}/\d{2,4}",
    "time_24h": r"\b(?:[01]?\d|2[0-3]):[0-5]\d(?:[:.][0-5]\d)?\b",
    "postal_us": r"\b\d{5}(?:-\d{4})?\b",
    "postal_uk": r"\b[A-Z]{1,2}\d[A-Z\d]? ?\d[A-Z]{2}\b",
    "html_color_hex": r"#[0-9A-Fa-f]{6}\b",
    "twitter_handle": r"@[\w]{1,15}",
    "hashtag": r"#[\w-]+",
    "mac_addr": r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}",
    "iban": r"[A-Z]{2}\d{2}[A-Z0-9]{11,30}",
    "credit_card": r"\b(?:4\d{12}(?:\d{3})?|5[1-5]\d{14}|3[47]\d{13}|6(?:011|5\d{2})\d{12})\b",
}

# The reference compiles with IGNORECASE|MULTILINE (:1814).
_FLAG_PREFIX = "(?im)"


def regex_extract(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    labels: list[str] | None = None,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """(id, label, value) — one row per match, native path."""
    cat = patterns or DEFAULT_PATTERNS
    labels = labels or list(cat)
    parts = []
    for label in labels:
        pat = _FLAG_PREFIX + cat[label]
        parts.append(
            df.select(
                F.col(id_col),
                F.lit(label).alias("label"),
                F.explode(
                    F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
                ).alias("value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def regex_extract_with_spans(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    labels: list[str] | None = None,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """(id, label, value, start, end) — reference-shaped output incl.
    character spans, via mapInPandas."""
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    cat = patterns or DEFAULT_PATTERNS
    labels = labels or list(cat)
    compiled = [(lbl, re.compile(cat[lbl], re.IGNORECASE | re.MULTILINE)) for lbl in labels]

    schema = StructType([
        StructField(id_col, LongType()),
        StructField("label", StringType()),
        StructField("value", StringType()),
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i, t in zip(b[id_col], b[text_col]):
                if not isinstance(t, str):
                    continue
                for lbl, rx in compiled:
                    for m in rx.finditer(t):
                        rows.append((int(i), lbl, m.group(0), m.start(), m.end()))
            yield pd.DataFrame(rows, columns=[id_col, "label", "value", "start", "end"])

    return df.select(id_col, text_col).mapInPandas(run, schema)
