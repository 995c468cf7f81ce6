"""Recrawl / freshness scheduling over the frontier + page cache.

The reference invalidates stale pages through CacheMode (ENABLED reads
skip refetch until an entry is invalidated; cache_context.py:1-92) —
at crawler scale the analogue is a *revisit policy*: pages whose cache
entry is older than a TTL must be fetched again even though the URL is
long seen.  Two models, both pure DataFrame transforms over the same
state tables the engine checkpoints, so a recrawl pass is: load
snapshot → transform → commit → `CrawlEngine.resume()`.

* **Re-enqueue in place** (`reenqueue_expired`): the frontier row
  flips done→pending; the URL stays in the seen set (it IS known — we
  just want a fresh copy).  This is the scheduled-revisit model; the
  resumed loop admits the row through the normal politeness/priority
  path and the fetch overwrites the cache entry (last-writer-wins
  `cache_merge`).

* **Forget** (`forget_expired`): the frontier row is dropped AND the
  url_hash is deleted from the cuckoo seen-filter
  (operators.cuckoo — the deletion-capable tier; a bloom filter
  cannot do this without a full rebuild).  The next time any page
  links to the URL it is rediscovered as brand new.  This is the
  model for content that may have ceased to exist.

Both scale as one hash-keyed join against the (url) key — the same
shuffle class as the seen anti-join; no driver collect.  TTL here is
measured in supersteps (`fetched_at_iter` is what the sandbox cache
records); a production cache keyed by wall-clock carries a timestamp
column and the predicate swaps, the plan shape does not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["expired_urls", "reenqueue_expired", "forget_expired", "evict_cache"]


def expired_urls(cache: DataFrame, current_iter: int, ttl_iters: int) -> DataFrame:
    """(url) rows whose cache entry is older than `ttl_iters`
    supersteps at `current_iter`."""
    return cache.filter(
        F.col("fetched_at_iter") <= F.lit(int(current_iter) - int(ttl_iters))
    ).select("url")


def reenqueue_expired(frontier: DataFrame, expired: DataFrame) -> DataFrame:
    """Flip expired done-rows back to pending (retry budget reset).

    Left-semi marks via a hash join on url; rows keep their seq /
    depth / score, so a resumed BFS revisits in the original
    discovery order after any still-pending work."""
    marked = frontier.join(
        expired.select(F.col("url").alias("_xu")),
        frontier["url"] == F.col("_xu"),
        "left",
    )
    hit = F.col("_xu").isNotNull() & (F.col("status") == "done")
    return (
        marked.withColumn(
            "status", F.when(hit, F.lit("pending")).otherwise(F.col("status"))
        )
        .withColumn(
            "retry_count", F.when(hit, F.lit(0)).otherwise(F.col("retry_count"))
        )
        .drop("_xu")
    )


def forget_expired(
    frontier: DataFrame,
    expired: DataFrame,
    seen_filter: DataFrame | None = None,
    n_shards: int = 16,
) -> tuple[DataFrame, DataFrame | None]:
    """Drop expired rows from the frontier and (when a cuckoo filter
    is maintained) delete their hashes from it, so rediscovered links
    route through the definitely-new fast path as genuinely fresh."""
    gone = expired.select("url").distinct()
    frontier_next = frontier.join(gone, "url", "left_anti")
    filter_next = seen_filter
    if seen_filter is not None:
        from crawl4ai_spark.operators.cuckoo import cuckoo_delete

        filter_next = cuckoo_delete(
            seen_filter,
            gone.select(F.xxhash64("url").alias("url_hash")),
            hash_col="url_hash",
            n_shards=n_shards,
        )
    return frontier_next, filter_next


def evict_cache(cache: DataFrame, expired: DataFrame) -> DataFrame:
    """Remove expired entries (the READ path must miss so the fetch
    actually happens; used with `reenqueue_expired` when the revisit
    should not serve the stale copy)."""
    return cache.join(expired.select("url").distinct(), "url", "left_anti")
