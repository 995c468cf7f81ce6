"""OPIC frontier scorer: hand-computed cash flow, conservation, and
engine integration through the link_score_fn seam."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl4ai_spark.operators.opic import OpicScorer

LINK_SCHEMA = (
    "parent_url string, batch_rank int, depth int, link_pos int, "
    "abs_url string, canon string, host string, score double"
)


def _links(spark, rows):
    return spark.createDataFrame(
        [(p, 1, 1, i, c, c, "h.test", 1.0) for i, (p, c) in enumerate(rows)],
        LINK_SCHEMA,
    )


def test_hand_computed_cash_flow(spark):
    sc = OpicScorer(spark, ["http://h.test/A", "http://h.test/B"])
    assert abs(sc.total_cash() - 1.0) < 1e-12

    A, B = "http://h.test/A", "http://h.test/B"
    l1 = _links(spark, [(A, "http://h.test/c1"), (A, "http://h.test/c2"),
                        (B, "http://h.test/c3")])
    out1 = {(r["parent_url"], r["canon"]): r["score"] for r in sc(l1, 1).collect()}
    # A cash .5 over 2 links → .25 each; B cash .5 over 1 link → .5
    assert abs(out1[(A, "http://h.test/c1")] - 1.25) < 1e-12
    assert abs(out1[(A, "http://h.test/c2")] - 1.25) < 1e-12
    assert abs(out1[(B, "http://h.test/c3")] - 1.5) < 1e-12

    cash = {r["url"]: r["cash"] for r in sc.cash.collect()}
    assert abs(cash["http://h.test/c1"] - 0.25) < 1e-12
    assert abs(cash["http://h.test/c2"] - 0.25) < 1e-12
    assert abs(cash["http://h.test/c3"] - 0.5) < 1e-12
    assert A not in cash and B not in cash
    assert abs(sc.total_cash() - 1.0) < 1e-12  # conserved

    # superstep 2: c1 distributes its .25; an unknown parent X gets the
    # default endowment (= 1/n_seeds = .5) — the documented cash source
    l2 = _links(spark, [("http://h.test/c1", "http://h.test/c3"),
                        ("http://h.test/X", "http://h.test/c4")])
    out2 = {r["canon"]: r["score"] for r in sc(l2, 2).collect()}
    assert abs(out2["http://h.test/c3"] - 1.25) < 1e-12
    assert abs(out2["http://h.test/c4"] - 1.5) < 1e-12
    cash2 = {r["url"]: r["cash"] for r in sc.cash.collect()}
    assert abs(cash2["http://h.test/c3"] - 0.75) < 1e-12
    assert abs(cash2["http://h.test/c2"] - 0.25) < 1e-12
    assert "http://h.test/c1" not in cash2
    assert abs(sc.total_cash() - 1.5) < 1e-12  # +0.5 endowment from X
    assert sc.supersteps == 2


def test_multi_parent_inflow_sums_in_state(spark):
    sc = OpicScorer(spark, ["http://h.test/A", "http://h.test/B"])
    # both parents link to the SAME target: state sums both inflows
    l1 = _links(spark, [("http://h.test/A", "http://h.test/t"),
                        ("http://h.test/B", "http://h.test/t")])
    sc(l1, 1).count()
    cash = {r["url"]: r["cash"] for r in sc.cash.collect()}
    assert abs(cash["http://h.test/t"] - 1.0) < 1e-12


def test_engine_integration_deterministic(spark):
    from crawl4ai_spark.plans.config import CrawlConfig
    from crawl4ai_spark.plans.crawl import CrawlEngine
    from crawl4ai_spark.sources.synthetic_web import (
        WebConfig, robots_rows, seed_urls, synthetic_pages_pdf,
    )

    web = WebConfig(n_pages=120, n_hosts=4, seed=11)
    pages = spark.createDataFrame(synthetic_pages_pdf(web)).cache()
    robots = spark.createDataFrame(robots_rows(web))
    seeds = seed_urls(web, 4)
    cfg = CrawlConfig(mode="best_first", max_depth=3, max_pages=40,
                      base_budget=3, global_budget=12, max_iterations=25)

    def run():
        sc = OpicScorer(spark, seeds)
        res = CrawlEngine(spark, cfg, pages, robots, link_score_fn=sc).run(seeds)
        log = [(r["iteration"], r["url"]) for r in
               res.crawl_log.orderBy("iteration", "batch_rank").collect()]
        return sc, res, log

    sc1, res1, log1 = run()
    sc2, res2, log2 = run()
    assert log1 == log2                      # deterministic policy
    assert res1.state.pages_crawled > 10
    assert sc1.supersteps >= 2
    assert sc1.cash.count() > 0
    # importance actually reorders vs the null scorer
    base = CrawlEngine(spark, cfg, pages, robots).run(seeds)
    base_log = [(r["iteration"], r["url"]) for r in
                base.crawl_log.orderBy("iteration", "batch_rank").collect()]
    assert base_log != log1
