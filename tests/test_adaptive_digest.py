"""Parity: plans/adaptive.adaptive_digest ≡ the sequential simulator
(testing/adaptive_simulator.simulate_digest) on crawl order, stop
iteration, stop reason, and metric values — the digest()-loop analogue
of tests/test_crawl_parity.py.

The corpus is a deterministic synthetic site whose texts are built so
different configs exercise every stop reason: confidence (rich
overlapping on-topic pages), max_pages / max_depth (budgets), min_gain
(a pocket of link anchors with no query/novelty signal), exhausted
(a tiny closed component).
"""

import pytest

from crawl4ai_spark.plans.adaptive import DigestConfig, adaptive_digest
from crawl4ai_spark.testing.adaptive_simulator import simulate_digest

QUERY = "spark shuffle partition tuning"

# url -> (text, [(href, anchor_text), ...])
SITE: dict = {}


def _page(url, text, links=()):
    SITE[url] = (text, list(links))


# on-topic cluster: heavy query-term overlap → confidence climbs fast
_page("https://a.test/root",
      "spark shuffle partition tuning guide overview spark shuffle",
      [("https://a.test/p1", "spark shuffle partition deep dive"),
       ("https://a.test/p2", "partition tuning walkthrough essay"),
       ("https://a.test/p3", "unrelated gardening flowers soil"),
       ("https://a.test/p4", "spark tuning notes appendix")])
_page("https://a.test/p1",
      "spark shuffle partition exchange hash tuning spark partition",
      [("https://a.test/p5", "shuffle spill compression ratios"),
       ("https://a.test/p2", "partition tuning walkthrough essay")])
_page("https://a.test/p2",
      "partition tuning spark shuffle skew salting partition spark",
      [("https://a.test/p6", "adaptive execution runtime plans")])
_page("https://a.test/p3",
      "gardening flowers soil compost watering bees",
      [("https://a.test/p7", "more gardening tips mulch")])
_page("https://a.test/p4",
      "spark tuning memory executor cores configuration",
      [("https://a.test/p5", "shuffle spill compression ratios")])
_page("https://a.test/p5",
      "shuffle spill compression spark partition tuning metrics",
      [])
_page("https://a.test/p6",
      "adaptive query execution spark runtime partition coalescing",
      [])
_page("https://a.test/p7", "mulch compost worms", [])

# no-signal pocket: anchors carry no query terms and no novel terms
# beyond the start page → min_gain stop
_page("https://b.test/root",
      "spark shuffle partition tuning alpha beta gamma",
      [("https://b.test/x1", "alpha beta"),
       ("https://b.test/x2", "beta gamma")])
_page("https://b.test/x1", "alpha beta page body", [])
_page("https://b.test/x2", "beta gamma page body", [])

# tiny closed component → exhausted
_page("https://c.test/solo",
      "lonely island page about spark",
      [])


@pytest.fixture(scope="module")
def pages_df(spark):
    rows = [
        (url, text, [{"href": h, "text": t} for h, t in links])
        for url, (text, links) in SITE.items()
    ]
    return spark.createDataFrame(
        rows,
        "url string, text string, "
        "links array<struct<href:string, text:string>>",
    )


CASES = [
    # (name, start, cfg kwargs)
    ("confidence_stop", "https://a.test/root",
     dict(confidence_threshold=0.55, max_depth=6, max_pages=20, top_k_links=2)),
    ("max_pages_stop", "https://a.test/root",
     dict(confidence_threshold=0.99, max_depth=8, max_pages=4, top_k_links=2,
          saturation_threshold=1.01, min_gain_threshold=0.0)),
    ("max_depth_stop", "https://a.test/root",
     dict(confidence_threshold=0.99, max_depth=2, max_pages=20, top_k_links=1,
          saturation_threshold=1.01, min_gain_threshold=0.0)),
    ("min_gain_stop", "https://b.test/root",
     dict(confidence_threshold=0.99, max_depth=5, max_pages=20, top_k_links=3,
          saturation_threshold=1.01, min_gain_threshold=0.35)),
    ("exhausted_stop", "https://c.test/solo",
     dict(confidence_threshold=0.99, max_depth=5, max_pages=20, top_k_links=3,
          saturation_threshold=1.01)),
]


@pytest.mark.parametrize("name,start,kw", CASES, ids=[c[0] for c in CASES])
def test_digest_parity(spark, pages_df, name, start, kw):
    sim = simulate_digest(SITE, start, QUERY, **kw)
    res = adaptive_digest(spark, pages_df, start, QUERY, DigestConfig(**kw))

    assert res.crawl_order == sim.crawl_order
    assert res.depth_reached == sim.depth_reached
    assert res.stop_reason == sim.stop_reason
    for k in ("coverage", "consistency", "saturation", "confidence"):
        assert res.metrics[k] == pytest.approx(sim.metrics[k], rel=1e-9), k
    # metric history agrees step by step
    assert len(res.metrics_history) == len(sim.metrics_history)
    for e, s in zip(res.metrics_history, sim.metrics_history):
        assert e["pages"] == s["pages"]
        assert e["confidence"] == pytest.approx(s["confidence"], rel=1e-9)
    # KB contents = crawled pages exactly
    kb_urls = {r["url"] for r in res.kb.select("url").collect()}
    assert kb_urls == set(sim.crawl_order)


def test_digest_missing_start(spark, pages_df):
    res = adaptive_digest(spark, pages_df, "https://nope.test/", QUERY)
    assert res.stop_reason == "no_start" and res.crawl_order == []


def test_digest_save_and_resume_matches_uninterrupted(spark, pages_df, tmp_path):
    """digest(resume_from=...) ≡ the uninterrupted run: a run stopped
    by a small max_depth and resumed from its saved state crawls the
    same pages in the same order as one uninterrupted run of the
    combined depth (reference CrawlState.save/load + digest
    resume_from; the depth counter restarts on resume like the
    reference's)."""
    kw = dict(confidence_threshold=0.99, max_pages=20, top_k_links=2,
              saturation_threshold=1.01, min_gain_threshold=0.0)
    start = "https://a.test/root"

    full = adaptive_digest(spark, pages_df, start, QUERY,
                           DigestConfig(max_depth=4, **kw))

    state = str(tmp_path / "digest_state")
    first = adaptive_digest(
        spark, pages_df, start, QUERY,
        DigestConfig(max_depth=2, save_state=True, state_path=state, **kw),
    )
    assert first.crawl_order == full.crawl_order[:len(first.crawl_order)]
    resumed = adaptive_digest(
        spark, pages_df, start, QUERY,
        DigestConfig(max_depth=2, **kw), resume_from=state,
    )
    assert resumed.crawl_order == full.crawl_order
    assert {r["url"] for r in resumed.kb.select("url").collect()} == set(
        full.crawl_order
    )
    for k in ("coverage", "consistency", "saturation", "confidence"):
        assert abs(resumed.metrics[k] - full.metrics[k]) < 1e-9, k


def test_digest_resume_strategy_mismatch_raises(spark, pages_df, tmp_path):
    import pytest as _pytest

    state = str(tmp_path / "digest_state2")
    adaptive_digest(
        spark, pages_df, "https://a.test/root", QUERY,
        DigestConfig(max_depth=1, save_state=True, state_path=state,
                     confidence_threshold=0.99, saturation_threshold=1.01,
                     min_gain_threshold=0.0),
    )
    with _pytest.raises(ValueError, match="strategy"):
        adaptive_digest(
            spark, pages_df, "https://a.test/root", QUERY,
            DigestConfig(strategy="embedding", max_depth=1),
            resume_from=state,
        )
