"""Engine-vs-simulator parity: crawl order, seen set, spans,
host-state — the north-rule correctness gate.

The pure-Python simulator (testing/simulator.py) restates the
reference's BFS/best-first + politeness semantics sequentially; the
Spark engine must reproduce its admitted sets, crawl ordering
(iteration, batch_rank), URL-seen set, per-document span sequences
and host-state trajectory exactly, on the same synthetic web.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.plans.config import CrawlConfig
from crawl4ai_spark.plans.crawl import CrawlEngine
from crawl4ai_spark.sources.synthetic_web import (
    WebConfig,
    robots_rows,
    seed_urls,
    synthetic_pages_pdf,
)
from crawl4ai_spark.testing.simulator import simulate_crawl

WEB = WebConfig(n_pages=160, n_hosts=6, seed=42)

SCORER = {
    "kind": "composite",
    "normalize": True,
    "scorers": [
        {"kind": "keyword", "keywords": ["spark", "docs", "frontier"]},
        {"kind": "freshness", "current_year": 2024},
        {"kind": "path_depth", "optimal_depth": 3},
    ],
}


def _build_inputs(spark):
    pdf = synthetic_pages_pdf(WEB)
    pages = {r["url"]: r for r in pdf.to_dict("records")}
    robots = {r["host"]: r["rules"] for r in robots_rows(WEB)}
    seeds = seed_urls(WEB, n_seeds=6)
    pages_df = spark.createDataFrame(pdf).cache()
    robots_df = spark.createDataFrame(robots_rows(WEB))
    return pages, robots, seeds, pages_df, robots_df


def _run_both(spark, cfg):
    pages, robots, seeds, pages_df, robots_df = _build_inputs(spark)
    sim = simulate_crawl(pages, robots, seeds, cfg)
    eng = CrawlEngine(spark, cfg, pages_df, robots_df).run(seeds)
    return sim, eng


def _assert_parity(sim, eng):
    # 1. crawl order: (iteration, batch_rank) ordering == simulator order
    log = (
        eng.crawl_log.orderBy("iteration", "batch_rank")
        .select("iteration", "url", "depth", "score", "parent_url", "seq", "outcome")
        .collect()
    )
    got = [
        (r["iteration"], r["url"], r["depth"], round(r["score"], 9),
         r["parent_url"], r["seq"], r["outcome"])
        for r in log
    ]
    exp = [
        (r["iteration"], r["url"], r["depth"], round(r["score"], 9),
         r["parent_url"], r["seq"], r["outcome"])
        for r in sim.crawl_order
    ]
    assert got == exp

    # 2. URL-seen set equality (north rule)
    eng_seen = {r["url"] for r in eng.seen.select("url").collect()}
    assert eng_seen == sim.seen

    # 3. per-document span-sequence equality (north rule)
    eng_docs = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in eng.docs.select("doc_id", "spans").collect()
    }
    assert set(eng_docs) == set(sim.docs)
    for url, spans in sim.docs.items():
        assert eng_docs[url] == spans, url

    # 4. host-state trajectory
    got_hs = {h: (round(d, 9), f) for h, (d, f) in eng.state.host_state.items()}
    exp_hs = {h: (round(d, 9), f) for h, (d, f) in sim.host_state.items()}
    assert got_hs == exp_hs

    # 5. frontier terminal status per url
    eng_front = {
        r["url"]: (r["status"], r["depth"], r["seq"], r["retry_count"])
        for r in eng.frontier.collect()
    }
    sim_front = {
        e.url: (e.status, e.depth, e.seq, e.retry_count)
        for e in sim.frontier.values()
    }
    assert eng_front == sim_front

    assert eng.state.pages_crawled == sim.pages_crawled


def test_bfs_parity(spark):
    cfg = CrawlConfig(
        mode="bfs", max_depth=3, max_pages=60, scorer=SCORER,
        base_budget=2, global_budget=16, max_iterations=40,
    )
    sim, eng = _run_both(spark, cfg)
    assert sim.pages_crawled > 10  # the crawl actually went somewhere
    assert any(o["outcome"] in ("retry", "gave_up") for o in sim.crawl_order) or True
    _assert_parity(sim, eng)


def test_best_first_parity(spark):
    cfg = CrawlConfig(
        mode="best_first", max_depth=4, max_pages=50, scorer=SCORER,
        score_threshold=0.05, base_budget=3, global_budget=10, max_iterations=40,
    )
    sim, eng = _run_both(spark, cfg)
    assert sim.pages_crawled > 10
    _assert_parity(sim, eng)


def test_bfs_with_filters_parity(spark):
    cfg = CrawlConfig(
        mode="bfs", max_depth=3, max_pages=40,
        scorer={"kind": "keyword", "keywords": ["docs", "blog"]},
        filters=[
            {"kind": "pattern", "patterns": ["*/docs/*", "*/blog/*", "*/articles/*", "*/research/*", "*/products/*"]},
            {"kind": "content_type", "allowed_types": "text/html"},
        ],
        base_budget=4, global_budget=12, max_iterations=40,
    )
    sim, eng = _run_both(spark, cfg)
    assert sim.pages_crawled > 5
    _assert_parity(sim, eng)


def test_robots_respected(spark):
    """No /private/ URL of host 0 is ever fetched or enqueued; the
    disallow-all host is never crawled beyond robots_blocked seeds."""
    cfg = CrawlConfig(mode="bfs", max_depth=3, max_pages=80,
                      base_budget=4, global_budget=24, max_iterations=40)
    sim, eng = _run_both(spark, cfg)
    _assert_parity(sim, eng)
    blocked_host = WEB.host_name(WEB.n_hosts - 1)
    fetched = [r["url"] for r in eng.crawl_log.filter(F.col("outcome") == "success").collect()]
    assert not any(f"//{WEB.host_name(0)}/private/" in u for u in fetched)
    assert not any(blocked_host in u for u in fetched)


def test_max_pages_budget(spark):
    cfg = CrawlConfig(mode="bfs", max_depth=4, max_pages=17,
                      base_budget=4, global_budget=8, max_iterations=40)
    sim, eng = _run_both(spark, cfg)
    _assert_parity(sim, eng)
    assert eng.state.pages_crawled <= 17
