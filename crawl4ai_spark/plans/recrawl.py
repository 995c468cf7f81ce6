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

__all__ = [
    "expired_urls",
    "reenqueue_expired",
    "forget_expired",
    "evict_cache",
    "change_rate_priority",
]


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
        expired.select(F.col("url").alias("_xu")).distinct(),
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
    n_shards: int | None = None,
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


def change_rate_priority(
    history: DataFrame,
    id_col: str = "url",
    ts_col: str = "ts",
    sig_col: str = "content_sig",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Which pages to revisit first: per-page Poisson change-rate
    estimation from the fetch history (Cho & Garcia-Molina 2003,
    "Estimating frequency of change" — public), then expected
    staleness now.

    `history` is (id, ts, content signature) — one row per past fetch
    (the crawl's docs/cache tables provide it; any change detector
    works as the signature: content hash, simhash band, etag).  For a
    page observed n times with X detected changes at mean interval I:

        λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / I      (bias-corrected)
        staleness = 1 - exp(-λ̂ · age_since_last_fetch)

    The TTL recrawl pass (`expired_urls`) is the degenerate λ-uniform
    policy; this ranks candidates so a bounded refetch budget goes to
    the pages most likely changed.

    Scale shape: ONE keyed window (partitionBy id — never global) for
    the change flags, one groupBy per page, and the corpus-wide "now"
    rides the plan as a broadcast 1-row agg (no driver collect).
    Pages seen once have no interval: they surface with null rate and
    staleness 0 (nothing is known to change).  Output: (id, n_obs,
    n_changes, change_rate /sec, staleness ∈ [0,1))."""
    from pyspark.sql import Window

    # tiebreak makes the lag deterministic when two fetches share a
    # timestamp (else the change count is partition-order dependent)
    order = ["_ts"] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(id_col).orderBy(*order)
    keep = [F.col(c) for c in ([tiebreak_col] if tiebreak_col else [])]
    obs = history.select(
        F.col(id_col),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(sig_col).alias("_sig"),
        *keep,
    ).withColumn(
        "_chg",
        (F.lag("_sig").over(w).isNotNull()
         & (F.col("_sig") != F.lag("_sig").over(w))).cast("int"),
    )
    per = obs.groupBy(id_col).agg(
        F.count("*").alias("n_obs"),
        F.sum("_chg").alias("n_changes"),
        F.min("_ts").alias("_first"),
        F.max("_ts").alias("_last"),
    )
    now = history.agg(F.max(F.col(ts_col).cast("timestamp")).alias("_now"))
    n, x = F.col("n_obs"), F.col("n_changes")
    span = F.unix_timestamp("_last") - F.unix_timestamp("_first")
    mean_int = span / (n - F.lit(1))
    lam = F.when(
        (n >= 2) & (span > 0),
        -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / mean_int,
    )
    age = F.unix_timestamp("_now") - F.unix_timestamp("_last")
    staleness = F.when(lam.isNull(), F.lit(0.0)).otherwise(
        F.lit(1.0) - F.exp(-lam * age)
    )
    return (
        per.crossJoin(F.broadcast(now))
        .select(
            id_col, "n_obs", "n_changes",
            lam.alias("change_rate"),
            staleness.alias("staleness"),
        )
    )
