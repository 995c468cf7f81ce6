"""Adaptive crawl driver loop (the reference's `digest()`).

Clean-room re-expression of AdaptiveCrawler.digest + StatisticalStrategy
(/root/reference/crawl4ai/adaptive_crawler.py:1266-1441, should_stop
:505-525, rank_links :391-417): crawl a start URL, then repeatedly

  1. score confidence = 0.4·coverage + 0.3·consistency + 0.3·saturation
     over the knowledge base gathered so far,
  2. stop if confident / out of budget / out of links / saturated,
  3. rank pending links by expected information gain
     (w_r·relevance + w_n·novelty + w_a·authority — operators.adaptive
     .adaptive_rank, R11),
  4. stop if the best link's expected gain is below min_gain_threshold,
  5. crawl the top-k links, fold them into the KB, repeat.

Spark-first shape: the knowledge base and the pending-link frontier
live as DataFrames (text never collects to the driver); per iteration
the only driver traffic is the metric SCALARS and the ≤ top_k selected
hrefs.  The loop itself is a driver loop by nature — adaptive crawling
is a small-page-count, stop-early algorithm (max_pages defaults to 20
in the reference), so supersteps are few and each is a fully
distributed plan.  At scale the same loop runs with a fetch UDF
instead of the corpus join; the plan shapes are unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.functions.bm25 import tokenize_py
from crawl4ai_spark.operators.adaptive import (
    adaptive_rank,
    confidence,
    consistency,
    coverage,
    new_terms_per_iteration,
    saturation,
)

__all__ = ["DigestConfig", "DigestResult", "adaptive_digest"]


@dataclass
class DigestConfig:
    """Mirrors the reference AdaptiveConfig defaults
    (adaptive_crawler.py:157-174)."""

    confidence_threshold: float = 0.7
    max_depth: int = 5
    max_pages: int = 20
    top_k_links: int = 3
    min_gain_threshold: float = 0.1
    saturation_threshold: float = 0.8
    relevance_weight: float = 0.5
    novelty_weight: float = 0.3
    authority_weight: float = 0.2


@dataclass
class DigestResult:
    kb: DataFrame                     # (url, iteration, text)
    crawl_order: list[str]
    metrics: dict[str, float]
    depth_reached: int
    stop_reason: str
    metrics_history: list[dict] = field(default_factory=list)


def _query_terms(query: str) -> list[str]:
    """Reference link/query tokenizer (_tokenize,
    adaptive_crawler.py:576-585): word tokens, length > 2, order kept."""
    return [t for t in tokenize_py(query) if len(t) > 2]


def adaptive_digest(
    spark: SparkSession,
    pages: DataFrame,
    start_url: str,
    query: str,
    cfg: DigestConfig | None = None,
    url_col: str = "url",
    text_col: str = "text",
    links_col: str = "links",
) -> DigestResult:
    """Crawl-until-confident over a page corpus.

    `pages` columns: (url_col: string, text_col: string, links_col:
    array<struct<href:string, text:string>>) — the extracted-document
    shape (CrawlEngine docs map onto it via url/markdown/links).

    Stop semantics in the reference's evaluation ORDER
    (digest :1325-1349 + should_stop :505-525): confidence →
    max_pages → frontier exhausted → saturation → no rankable links →
    min-gain.  Link selection is rank DESC, discovery-seq ASC — the
    reference's stable sort over append-ordered pending links.
    """
    cfg = cfg or DigestConfig()
    qt = _query_terms(query)

    pages = pages.select(
        F.col(url_col).alias("url"),
        F.col(text_col).alias("text"),
        F.col(links_col).alias("links"),
    )

    crawled: list[str] = []           # urls only — O(max_pages) driver state
    kb: DataFrame | None = None       # (url, iteration, text) — stays distributed
    pending: DataFrame | None = None  # (href, link_text, seq) — stays distributed
    metrics: dict[str, float] = {}
    history: list[dict] = []

    def _fetch(urls: list[str], iteration: int) -> DataFrame:
        batch = pages.filter(F.col("url").isin(urls))
        return batch.select(
            "url", F.lit(iteration).alias("iteration"), "text", "links"
        ).localCheckpoint(eager=True)  # cut lineage; batch is ≤ top_k rows

    def _merge(batch: DataFrame, iteration: int) -> None:
        nonlocal kb, pending, crawled
        fetched = batch.select("url", "iteration", "text")
        kb = fetched if kb is None else kb.union(fetched)
        # discovery seq = (iteration, fetch-rank of source page,
        # within-page position): the reference appends links to
        # pending in exactly this order, and its stable score sort
        # preserves it on ties.  Fetch rank comes from the crawl
        # order (a when-chain over ≤ max_pages urls — tiny).
        rank_expr = F.lit(0)
        for i, u in enumerate(crawled):
            rank_expr = F.when(F.col("_src") == u, F.lit(i)).otherwise(rank_expr)
        links = (
            batch.select(
                F.col("url").alias("_src"),
                F.posexplode_outer("links").alias("_pos", "_lnk"),
            )
            .filter(F.col("_lnk.href").isNotNull())
            .select(
                F.col("_lnk.href").alias("href"),
                F.coalesce(F.col("_lnk.text"), F.lit("")).alias("link_text"),
                (F.lit(iteration) * F.lit(1 << 40)
                 + rank_expr.cast("long") * F.lit(1 << 20)
                 + F.col("_pos")).alias("seq"),
            )
        )
        pending = links if pending is None else pending.union(links)

    # ── initial crawl (digest :1306-1323) ────────────────────────────
    batch0 = _fetch([start_url], 0)
    if batch0.limit(1).count() == 0:
        return DigestResult(
            kb=spark.createDataFrame([], "url string, iteration int, text string"),
            crawl_order=[], metrics={}, depth_reached=0, stop_reason="no_start",
        )
    crawled.append(start_url)
    _merge(batch0, 0)

    depth = 0
    stop_reason = "max_depth"
    while depth < cfg.max_depth:
        # dedup pending by first discovery, drop crawled
        cand = (
            pending.groupBy("href")
            .agg(F.min("seq").alias("seq"), F.min_by("link_text", "seq").alias("link_text"))
            .filter(~F.col("href").isin(crawled))
        )

        # metrics over the current KB
        kb_named = kb.select(F.col("url").alias("doc_id"), "iteration", "text")
        cov = coverage(kb_named, qt)
        cons = consistency(kb_named)
        sat = saturation(new_terms_per_iteration(kb_named))
        conf = confidence(cov, cons, sat)
        metrics = {
            "coverage": cov, "consistency": cons,
            "saturation": sat, "confidence": conf,
        }
        history.append({"depth": depth, "pages": len(crawled), **metrics})

        # should_stop — reference order (should_stop :505-525)
        if conf >= cfg.confidence_threshold:
            stop_reason = "confidence"
            break
        if len(crawled) >= cfg.max_pages:
            stop_reason = "max_pages"
            break
        if cand.limit(1).count() == 0:
            stop_reason = "exhausted"
            break
        if sat >= cfg.saturation_threshold:
            stop_reason = "saturation"
            break

        # rank pending links by expected information gain (R11)
        ranked = adaptive_rank(
            cand.select(F.col("href").alias("doc_id"),
                        F.col("link_text").alias("text"), "seq"),
            kb_named.select("text"),
            query,
            relevance_weight=cfg.relevance_weight,
            novelty_weight=cfg.novelty_weight,
            authority_weight=cfg.authority_weight,
        )
        top = (
            ranked.orderBy(F.desc("adaptive_score"), F.asc("seq"))
            .limit(cfg.top_k_links)
            .select(F.col("doc_id").alias("href"), "adaptive_score")
            .collect()
        )
        if not top:
            stop_reason = "exhausted"
            break
        if top[0]["adaptive_score"] < cfg.min_gain_threshold:
            stop_reason = "min_gain"
            break

        to_crawl = [r["href"] for r in top]
        batch = _fetch(to_crawl, depth + 1)
        got = {r["url"] for r in batch.select("url").collect()}
        crawled.extend(u for u in to_crawl if u in got)
        if got:
            _merge(batch, depth + 1)
        depth += 1
        kb = kb.localCheckpoint(eager=True)
        pending = pending.localCheckpoint(eager=True)

    else:
        # loop fell off the end: recompute final metrics like the
        # reference's final calculate_confidence (digest :1387-1397)
        kb_named = kb.select(F.col("url").alias("doc_id"), "iteration", "text")
        cov = coverage(kb_named, qt)
        cons = consistency(kb_named)
        sat = saturation(new_terms_per_iteration(kb_named))
        metrics = {
            "coverage": cov, "consistency": cons, "saturation": sat,
            "confidence": confidence(cov, cons, sat),
        }

    metrics["pages_crawled"] = float(len(crawled))
    metrics["depth_reached"] = float(depth)
    return DigestResult(
        kb=kb.select("url", "iteration", "text"),
        crawl_order=list(crawled),
        metrics=metrics,
        depth_reached=depth,
        stop_reason=stop_reason,
        metrics_history=history,
    )
