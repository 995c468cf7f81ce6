"""Page-cache modes (S10/J3) — CacheMode gating over a pages-cache
table.

Clean-room re-expression of the reference's cache context
(/root/reference/crawl4ai/cache_context.py:1-92): ENABLED reads and
writes, DISABLED/BYPASS neither, READ_ONLY reads, WRITE_ONLY writes;
only http(s)/file URLs are cacheable; `always_bypass` wins over
everything.

Spark shape: the cache is an ordinary (url, final_url, status_code,
html, fetched_at_iter) table.  Reading is a broadcast-or-shuffle left
join producing per-row hit columns; writing is a last-writer-wins
merge keyed by url (a window dedup — MERGE INTO on Iceberg).  The
CrawlEngine threads these around its fetch stage so cache hits skip
the fetch entirely, matching async_webcrawler.py's cache short-
circuit (:318-420)."""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["CacheMode", "should_read", "should_write", "is_cacheable",
           "cache_lookup", "cache_merge", "CACHE_COLS"]

CACHE_COLS = "url string, final_url string, status_code int, html string, fetched_at_iter int"


class CacheMode(Enum):
    ENABLED = "enabled"
    DISABLED = "disabled"
    READ_ONLY = "read_only"
    WRITE_ONLY = "write_only"
    BYPASS = "bypass"


def should_read(mode: CacheMode, always_bypass: bool = False) -> bool:
    if always_bypass:
        return False
    return mode in (CacheMode.ENABLED, CacheMode.READ_ONLY)


def should_write(mode: CacheMode, always_bypass: bool = False) -> bool:
    if always_bypass:
        return False
    return mode in (CacheMode.ENABLED, CacheMode.WRITE_ONLY)


def is_cacheable(url: Column) -> Column:
    """http(s) and file URLs cache; raw: never does
    (cache_context.py:54)."""
    return (
        url.startswith("http://") | url.startswith("https://") | url.startswith("file://")
    )


def cache_lookup(batch: DataFrame, cache: DataFrame, url_col: str = "url") -> DataFrame:
    """Left-join cache hit columns onto the admitted batch: adds
    cache_hit (bool), c_status, c_html, c_final_url.  Non-cacheable
    URLs never hit.  The cache side projects only its needed columns;
    at 10^10 rows this is the same hash-keyed shuffle shape as the
    seen join (or a storage-partitioned join on an Iceberg cache)."""
    c = cache.select(
        F.col("url").alias(url_col),
        F.col("status_code").alias("c_status"),
        F.col("html").alias("c_html"),
        F.col("final_url").alias("c_final_url"),
    )
    out = batch.join(c, url_col, "left")
    hit = F.col("c_status").isNotNull() & is_cacheable(F.col(url_col))
    return out.withColumn("cache_hit", hit)


def cache_merge(
    cache: DataFrame, fetched: DataFrame, iteration: int,
    url_col: str = "url",
) -> DataFrame:
    """Last-writer-wins upsert of newly fetched pages into the cache
    (only cacheable, successfully fetched rows are written —
    async_webcrawler.py caches valid results).  Equivalent to Iceberg
    MERGE INTO ... WHEN MATCHED UPDATE."""
    new_rows = (
        fetched.filter(is_cacheable(F.col(url_col)) & (F.col("eff_status") == 200))
        .select(
            F.col(url_col).alias("url"),
            F.col("final_url"),
            F.col("eff_status").alias("status_code"),
            F.col("eff_html").alias("html"),
            F.lit(iteration).alias("fetched_at_iter"),
        )
    )
    merged = cache.unionByName(new_rows)
    w = Window.partitionBy("url").orderBy(F.desc("fetched_at_iter"))
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
