"""End-to-end composition: crawl → interleaved docs → curation ops.

The crawl engine's output docs ARE the interleaved payload schema, so
every training-data operator must run on them directly — this is the
"a user can pipe the crawler into the curation pipeline" guarantee.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.plans.config import CrawlConfig
from crawl4ai_spark.plans.crawl import CrawlEngine
from crawl4ai_spark.sources.synthetic_web import (
    WebConfig, robots_rows, seed_urls, synthetic_pages_df,
)


def _crawl_docs(spark):
    web = WebConfig(n_pages=150, n_hosts=4, seed=7)
    pages = synthetic_pages_df(spark, web).cache()
    robots = spark.createDataFrame(robots_rows(web))
    cfg = CrawlConfig(mode="bfs", max_depth=2, max_pages=40,
                      base_budget=4, global_budget=16, max_iterations=10)
    res = CrawlEngine(spark, cfg, pages, robots).run(seed_urls(web, 4))
    return res.docs


def test_crawl_docs_feed_curation_pipeline(spark):
    from crawl4ai_spark.operators.interleaved import (
        media_manifest, render_for_training, span_integrity,
    )
    from crawl4ai_spark.operators.repetition import gopher_repetition
    from crawl4ai_spark.operators.text import quality_score, ws_token_count

    docs = _crawl_docs(spark).cache()
    n_docs = docs.count()
    assert n_docs > 0

    # 1. every crawled doc passes the span-integrity gate
    integ = docs.select(span_integrity("spans").alias("s"))
    bad = integ.filter(~F.col("s.offsets_ok")).count()
    assert bad == 0
    assert integ.filter(F.col("s.n_spans") > 0).count() == n_docs

    # 2. rendering: placeholder count == media span count, refs aligned
    r = render_for_training("spans")
    rendered = docs.select(
        "doc_id",
        r["text"].alias("txt"),
        F.size(r["media_refs"]).alias("n_refs"),
        span_integrity("spans")["n_media"].alias("n_media"),
    )
    mism = rendered.filter(F.col("n_refs") != F.col("n_media")).count()
    assert mism == 0
    tok_mism = rendered.filter(
        F.size(F.split("txt", r"<\|image\|>")) - 1 != F.col("n_refs")
    ).count()
    assert tok_mism == 0

    # 3. the rendered text flows straight into the text-quality operators
    q = rendered.select(
        ws_token_count("txt").alias("toks"),
        F.round(quality_score("txt"), 6).alias("quality"),
        gopher_repetition("txt")["top_2gram_char_frac"].alias("rep2"),
    )
    rows = q.collect()
    assert all(r.toks > 0 for r in rows)
    assert all(0.0 <= r.quality <= 1.0 for r in rows)

    # 4. media manifest aggregates the crawl's real asset refs
    man = media_manifest(docs)
    total_uses = man.agg(F.sum("n_uses")).collect()[0][0] or 0
    total_media = docs.select(
        F.sum(span_integrity("spans")["n_media"]).alias("m")
    ).collect()[0].m
    assert total_uses == total_media
