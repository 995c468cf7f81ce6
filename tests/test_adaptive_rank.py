"""R11 — adaptive link rank: hand-computed goldens + the engine's
link_score_fn frontier-scorer seam.

Reference semantics (adaptive_crawler.py:391-503): score =
0.5·relevance + 0.3·novelty + 0.2·authority with relevance = query-
term overlap ratio, novelty = fraction of preview terms absent from
the knowledge base, authority = 1.0 (live) or the URL heuristic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.operators.adaptive import adaptive_rank


def test_adaptive_rank_golden(spark):
    # KB knows: alpha beta gamma delta (len>2 tokens)
    kb = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    links = spark.createDataFrame(
        [
            # 4 terms: spark frontier alpha beta → rel 2/2=1.0 (spark,
            # frontier both present), novelty 2/4 (spark, frontier new)
            (1, "spark frontier alpha beta"),
            # no query terms, all KB-known → rel 0, novelty 0
            (2, "alpha beta"),
            # empty preview → rel 0, novelty 0.5
            (3, ""),
            # all-new terms, one query term → rel 1/2, novelty 1.0
            (4, "spark zeppelin"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            round(r["relevance"], 9),
            round(r["novelty"], 9),
            round(r["authority"], 9),
            round(r["adaptive_score"], 9),
        )
        for r in adaptive_rank(links, kb, "spark frontier").collect()
    }
    # hand-computed: score = 0.5·rel + 0.3·nov + 0.2·1.0
    assert got[1] == (1.0, 0.5, 1.0, round(0.5 * 1.0 + 0.3 * 0.5 + 0.2, 9))
    assert got[2] == (0.0, 0.0, 1.0, round(0.2, 9))
    assert got[3] == (0.0, 0.5, 1.0, round(0.3 * 0.5 + 0.2, 9))
    assert got[4] == (0.5, 1.0, 1.0, round(0.5 * 0.5 + 0.3 + 0.2, 9))


def test_adaptive_rank_empty_kb_and_url_authority(spark):
    kb = spark.createDataFrame([], "doc_id long, text string")
    links = spark.createDataFrame(
        [
            (1, "brand new terms", "https://x.test/docs/guide/a"),
            (2, "brand new terms", "https://x.test/api/b"),
            (3, "brand new terms", "https://x.test/img/c.png"),
        ],
        "doc_id long, text string, url string",
    )
    got = {
        r["doc_id"]: (round(r["novelty"], 9), round(r["authority"], 9))
        for r in adaptive_rank(
            links, kb, "unrelated query", authority="url", url_col="url"
        ).collect()
    }
    # empty KB → every term new → novelty 1.0 (reference returns 1.0)
    assert got[1] == (1.0, round(0.5 + 0.2 + 0.1, 9))   # docs+guide
    assert got[2] == (1.0, round(0.5 + 0.2, 9))         # api
    assert got[3] == (1.0, round(0.5 - 0.3, 9))         # image penalty


def test_link_score_fn_reorders_frontier(spark):
    """The R11 seam: a custom frontier scorer rewrites `score` on the
    candidate links and best-first admission follows it (lower =
    higher priority, the reference's min-heap)."""
    from crawl4ai_spark.plans.config import CrawlConfig
    from crawl4ai_spark.plans.crawl import CrawlEngine
    from crawl4ai_spark.sources.synthetic_web import (
        WebConfig, robots_rows, seed_urls, synthetic_pages_df,
    )

    web = WebConfig(n_pages=160, n_hosts=6, seed=42)
    pages = synthetic_pages_df(spark, web).cache()
    robots = spark.createDataFrame(robots_rows(web))
    seeds = seed_urls(web, n_seeds=4)
    cfg = CrawlConfig(mode="best_first", max_depth=3, max_pages=40,
                      base_budget=8, global_budget=8, max_iterations=20)

    def promote_docs(links, iteration):
        # push /docs/ URLs to the front of the priority queue
        return links.withColumn(
            "score",
            F.when(F.col("canon").contains("/docs/"), F.lit(-1.0)).otherwise(
                F.lit(0.0)
            ),
        )

    base = CrawlEngine(spark, cfg, pages, robots).run(seeds)
    boosted = CrawlEngine(
        spark, cfg, pages, robots, link_score_fn=promote_docs
    ).run(seeds)

    def mean_rank_of_docs(res):
        rows = res.crawl_log.orderBy("iteration", "batch_rank").collect()
        ranks = [i for i, r in enumerate(rows) if "/docs/" in r["url"]]
        return sum(ranks) / len(ranks) if ranks else None

    b, p = mean_rank_of_docs(base), mean_rank_of_docs(boosted)
    assert p is not None and b is not None
    assert p < b  # docs URLs crawled strictly earlier under the hook
    # scores recorded in the log reflect the hook
    assert boosted.crawl_log.filter(F.col("score") == -1.0).count() > 0
