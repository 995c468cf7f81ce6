"""Canonical StructTypes for every engine table.

Data-model mapping from the reference's Pydantic records (SURVEY.md §1,
crawl4ai/models.py) into columnar Spark schemas.  The `docs` table is
the north-rule output shape from BASELINE.json `input_hint`:
(doc_id string, spans array<struct<kind,text,media_ref,offset>>).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ── north-rule output: interleaved text+media span documents ──────────
SPAN = StructType(
    [
        StructField("kind", StringType()),       # 'text' | 'media'
        StructField("text", StringType()),       # markdown block text ('' for media)
        StructField("media_ref", StringType()),  # resolved src ('' for text)
        StructField("offset", IntegerType()),    # 0-based position in sequence
    ]
)
DOCS = StructType(
    [
        StructField("doc_id", StringType()),     # canonical page URL
        StructField("spans", ArrayType(SPAN)),
    ]
)

# ── synthetic web (stands in for the network; FIXTURES.md §2) ──────────
PAGES_RAW = StructType(
    [
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("status_code", IntegerType()),
        StructField("redirect_to", StringType()),
        StructField("content_type", StringType()),
        StructField("html", StringType()),
        StructField("fetch_ms", IntegerType()),
    ]
)

# ── frontier (reference: priority-queue tuples, bff_strategy.py:141-143) ─
FRONTIER = StructType(
    [
        StructField("url", StringType()),          # canonical URL (crawl identity)
        StructField("url_hash", LongType()),       # xxhash64(url)
        StructField("host", StringType()),
        StructField("depth", IntegerType()),
        StructField("score", DoubleType()),
        StructField("parent_url", StringType()),
        StructField("seq", LongType()),            # FIFO tiebreak (discovery order)
        StructField("status", StringType()),       # pending | done | failed
        StructField("retry_count", IntegerType()),
        StructField("enqueue_iter", IntegerType()),
    ]
)

# ── seen set: hashes only ever shuffle at scale ────────────────────────
SEEN = StructType(
    [
        StructField("url_hash", LongType()),
        StructField("url", StringType()),
        StructField("first_iter", IntegerType()),
    ]
)

# ── link as extracted from a page (reference models.py:343-353) ────────
LINK = StructType(
    [
        StructField("href", StringType()),
        StructField("text", StringType()),
        StructField("title", StringType()),
        StructField("internal", BooleanType()),
    ]
)

MEDIA_ITEM = StructType(
    [
        StructField("src", StringType()),
        StructField("alt", StringType()),
        StructField("media_type", StringType()),   # image | video | audio
        StructField("score", IntegerType()),
        StructField("group_id", IntegerType()),    # document-order index
    ]
)

# ── scrape UDF output (reference ScrapingResult, models.py:372-377) ────
SCRAPE_RESULT = StructType(
    [
        StructField("cleaned_html", StringType()),
        StructField("success", BooleanType()),
        StructField("links", ArrayType(LINK)),
        StructField("media", ArrayType(MEDIA_ITEM)),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)

# ── markdown UDF output (reference MarkdownGenerationResult) ───────────
MARKDOWN_RESULT = StructType(
    [
        StructField("raw_markdown", StringType()),
        StructField("markdown_with_citations", StringType()),
        StructField("references_markdown", StringType()),
    ]
)

# ── fetch stage output (reference AsyncCrawlResponse, models.py:310-326) ─
FETCH_RESULT = StructType(
    [
        StructField("status_code", IntegerType()),
        StructField("html", StringType()),
        StructField("redirected_url", StringType()),
        StructField("success", BooleanType()),
        StructField("fetch_ms", IntegerType()),
    ]
)

# ── per-host politeness state (reference DomainState, models.py:15-19) ─
HOST_STATE = StructType(
    [
        StructField("host", StringType()),
        StructField("current_delay", DoubleType()),
        StructField("fail_count", IntegerType()),
        StructField("last_iter", IntegerType()),
    ]
)

ROBOTS = StructType(
    [
        StructField("host", StringType()),
        StructField("rules", StringType()),
        StructField("fetch_time", LongType()),
    ]
)

# ── per-iteration lineage/metrics manifest (north rule: resumable runs
#    with per-partition lineage + metrics) ─────────────────────────────
CRAWL_RUN = StructType(
    [
        StructField("run_id", StringType()),
        StructField("iteration", IntegerType()),
        StructField("snapshot_id", StringType()),
        StructField("pages_crawled", LongType()),
        StructField("pages_failed", LongType()),
        StructField("frontier_pending", LongType()),
        StructField("seen_count", LongType()),
        StructField("wall_ms", LongType()),
    ]
)
