"""Recrawl / freshness scheduling (plans.recrawl): re-enqueue expired
pages through a store round-trip + resume, forget via cuckoo deletion,
and cache eviction feeding the read path."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl4ai_spark.plans.cache import cache_lookup
from crawl4ai_spark.plans.config import CrawlConfig
from crawl4ai_spark.plans.crawl import CrawlEngine
from crawl4ai_spark.plans.recrawl import (
    evict_cache,
    expired_urls,
    forget_expired,
    reenqueue_expired,
)
from crawl4ai_spark.plans.state import SnapshotStore
from crawl4ai_spark.sources.synthetic_web import (
    WebConfig, robots_rows, seed_urls, synthetic_pages_pdf,
)

WEB = WebConfig(n_pages=120, n_hosts=5, seed=42)


def _inputs(spark):
    pages = spark.createDataFrame(synthetic_pages_pdf(WEB)).cache()
    robots = spark.createDataFrame(robots_rows(WEB))
    return pages, robots, seed_urls(WEB, n_seeds=5)


def test_reenqueue_and_resume_refetches(spark, tmp_path):
    """done→pending flip + resume(): exactly the expired URLs are
    fetched a second time; seen set and everything else unchanged."""
    pages, robots, seeds = _inputs(spark)
    cfg = CrawlConfig(mode="bfs", max_depth=2, max_pages=500,
                      base_budget=4, global_budget=12, max_iterations=30)
    store = SnapshotStore(str(tmp_path / "store"))
    first = CrawlEngine(spark, cfg, pages, robots, store=store).run(seeds)
    n1 = first.state.pages_crawled
    assert n1 > 5

    expired = (
        first.crawl_log
        .filter((F.col("iteration") == 1) & (F.col("outcome") == "success"))
        .select("url")
    ).cache()
    n_exp = expired.count()
    assert n_exp > 0

    # transform the checkpointed frontier and commit it as the next
    # snapshot (the Iceberg-MERGE analogue of a revisit-policy pass)
    m = store.read_manifest()
    frontier2 = reenqueue_expired(store.load(spark, "frontier"), expired)
    store.commit(
        snapshot_id=m["snapshot_id"] + 1,
        tables={"frontier": frontier2,
                "docs": store.load(spark, "docs"),
                "crawl_log": store.load(spark, "crawl_log")},
        state=m["state"],
    )

    resumed = CrawlEngine(spark, cfg, pages, robots, store=store).resume()
    assert resumed.state.pages_crawled == n1 + n_exp

    # the refetched URLs are exactly the expired set, each now fetched
    # twice; every other URL exactly once
    per_url = {
        r["url"]: r["n"]
        for r in resumed.crawl_log.filter(F.col("outcome") == "success")
        .groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    exp_set = {r["url"] for r in expired.collect()}
    for u, n in per_url.items():
        assert n == (2 if u in exp_set else 1), u

    # seen set unchanged (re-enqueue keeps the row)
    first_seen = {r["url"] for r in first.seen.collect()}
    resumed_seen = {r["url"] for r in resumed.seen.collect()}
    assert resumed_seen == first_seen


def test_forget_expired_deletes_from_cuckoo(spark):
    from crawl4ai_spark.operators.cuckoo import cuckoo_add, cuckoo_probe, empty_cuckoo

    urls = spark.range(0, 400).select(
        F.concat(F.lit("http://h.test/p"), F.col("id")).alias("url")
    ).withColumn("url_hash", F.xxhash64("url")).withColumn(
        "status", F.lit("done")
    )
    filt = cuckoo_add(
        empty_cuckoo(spark, 8, 256), urls.select("url_hash"),
        hash_col="url_hash", n_shards=8,
    ).cache()

    expired = urls.filter(F.col("url").rlike("p[0-9]?[0-9]$")).select("url")  # p0..p99
    n_exp = expired.count()
    frontier2, filt2 = forget_expired(urls, expired, filt, n_shards=8)
    filt2 = filt2.cache()

    assert frontier2.count() == 400 - n_exp
    # forgotten: probe flips to not-seen (up to the FP floor)
    exp_hashes = expired.select(F.xxhash64("url").alias("url_hash"))
    still = (
        cuckoo_probe(exp_hashes, filt2, hash_col="url_hash", n_shards=8)
        .filter(F.col("maybe_seen")).count()
    )
    assert still <= 0.02 * n_exp
    # kept: still zero false negatives
    kept_hashes = frontier2.select("url_hash")
    missing = (
        cuckoo_probe(kept_hashes, filt2, hash_col="url_hash", n_shards=8)
        .filter(~F.col("maybe_seen")).count()
    )
    assert missing == 0


def test_change_rate_priority(spark):
    """Cho & Garcia-Molina estimator on a hand-computable history."""
    import datetime as dt
    import math

    from crawl4ai_spark.plans.recrawl import change_rate_priority

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        ("A", s(0), 1), ("A", s(100), 1), ("A", s(200), 2),  # 1 change / I=100
        ("B", s(250), 7),                                     # single obs
    ]
    hist = spark.createDataFrame(rows, "url string, ts timestamp, content_sig int")
    got = {r["url"]: r for r in change_rate_priority(hist).collect()}

    lam = -math.log((3 - 1 + 0.5) / (3 + 0.5)) / 100.0
    stale = 1.0 - math.exp(-lam * (250 - 200))
    assert got["A"]["n_obs"] == 3 and got["A"]["n_changes"] == 1
    assert abs(got["A"]["change_rate"] - lam) < 1e-12
    assert abs(got["A"]["staleness"] - stale) < 1e-12
    # single observation: unknown rate, zero staleness
    assert got["B"]["change_rate"] is None
    assert got["B"]["staleness"] == 0.0


def test_expiry_predicate_and_cache_eviction(spark):
    cache = spark.createDataFrame(
        [("http://h.test/a", "http://h.test/a", 200, "<html>a</html>", 1),
         ("http://h.test/b", "http://h.test/b", 200, "<html>b</html>", 5)],
        "url string, final_url string, status_code int, html string, fetched_at_iter int",
    )
    exp = expired_urls(cache, current_iter=6, ttl_iters=3)
    assert {r["url"] for r in exp.collect()} == {"http://h.test/a"}

    evicted = evict_cache(cache, exp)
    batch = spark.createDataFrame(
        [("http://h.test/a",), ("http://h.test/b",)], "url string"
    )
    hits = {r["url"]: r["cache_hit"] for r in cache_lookup(batch, evicted).collect()}
    assert hits == {"http://h.test/a": False, "http://h.test/b": True}
