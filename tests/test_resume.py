"""Checkpoint/resume (M7): kill the crawl mid-run, resume from the
snapshot store, and land in exactly the state of an uninterrupted run
(north rule: resumable from Iceberg snapshots — here the parquet
snapshot store with atomic manifest swap)."""

from __future__ import annotations

from crawl4ai_spark.plans.config import CrawlConfig
from crawl4ai_spark.plans.crawl import CrawlEngine
from crawl4ai_spark.plans.state import SnapshotStore
from crawl4ai_spark.sources.synthetic_web import (
    WebConfig, robots_rows, seed_urls, synthetic_pages_pdf,
)

WEB = WebConfig(n_pages=120, n_hosts=5, seed=42)


def _inputs(spark):
    pdf = synthetic_pages_pdf(WEB)
    pages = spark.createDataFrame(pdf).cache()
    robots = spark.createDataFrame(robots_rows(WEB))
    return pages, robots, seed_urls(WEB, n_seeds=5)


def _cfg(max_iterations: int) -> CrawlConfig:
    return CrawlConfig(mode="bfs", max_depth=3, max_pages=40,
                       base_budget=4, global_budget=12,
                       max_iterations=max_iterations)


def test_kill_and_resume_matches_uninterrupted(spark, tmp_path):
    pages, robots, seeds = _inputs(spark)

    # uninterrupted reference run
    full = CrawlEngine(spark, _cfg(30), pages, robots).run(seeds)

    # interrupted run: stop after 2 iterations, state committed to the store
    store = SnapshotStore(str(tmp_path / "store"))
    partial = CrawlEngine(spark, _cfg(2), pages, robots, store=store).run(seeds)
    assert partial.state.iteration == 2
    assert store.read_manifest()["snapshot_id"] == 2

    # resume in a NEW engine (fresh driver state) and finish
    resumed = CrawlEngine(spark, _cfg(30), pages, robots, store=store).resume()

    assert resumed.state.pages_crawled == full.state.pages_crawled
    assert resumed.state.next_seq == full.state.next_seq

    f_seen = {r["url"] for r in full.seen.collect()}
    r_seen = {r["url"] for r in resumed.seen.collect()}
    assert r_seen == f_seen

    f_log = [(r["iteration"], r["url"], r["outcome"])
             for r in full.crawl_log.orderBy("iteration", "batch_rank").collect()]
    r_log = [(r["iteration"], r["url"], r["outcome"])
             for r in resumed.crawl_log.orderBy("iteration", "batch_rank").collect()]
    assert r_log == f_log

    f_docs = {r["doc_id"] for r in full.docs.collect()}
    r_docs = {r["doc_id"] for r in resumed.docs.collect()}
    assert r_docs == f_docs

    hs_f = {h: (round(d, 9), n) for h, (d, n) in full.state.host_state.items()}
    hs_r = {h: (round(d, 9), n) for h, (d, n) in resumed.state.host_state.items()}
    assert hs_r == hs_f


def test_manifest_atomicity(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store2"))
    pages, robots, seeds = _inputs(spark)
    CrawlEngine(spark, _cfg(1), pages, robots, store=store).run(seeds)
    m = store.read_manifest()
    # seen is no longer a separate table: the frontier subsumes it
    # (trimmed rows keep their row, so seen ≡ frontier.url)
    assert set(m["tables"]) == {"frontier", "docs", "crawl_log"}
    # every referenced snapshot path exists, loads, and carries
    # per-partition lineage that agrees with the actual row count
    for name in m["tables"]:
        df = store.load(spark, name)
        assert df is not None
        t = m["tables"][name]
        assert t["files"], f"{name}: no part-file lineage recorded"
        for f in t["files"]:
            assert f["bytes"] > 0 and "rows" in f and "row_groups" in f
        assert t["rows"] == df.count()
    assert "pages_crawled" in m["metrics"]
    # lineage log chains snapshots parent -> child and survives pruning
    lin = store.lineage()
    ids = [e["snapshot_id"] for e in lin]
    assert ids == sorted(set(ids)), f"duplicate/unordered snapshots: {ids}"
    assert lin[0]["parent_snapshot_id"] is None
    for prev, cur in zip(lin, lin[1:]):
        assert cur["parent_snapshot_id"] == prev["snapshot_id"]
    assert lin[-1]["snapshot_id"] == m["snapshot_id"]
