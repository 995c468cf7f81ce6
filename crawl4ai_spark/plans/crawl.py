"""The distributed crawl loop: level-synchronous supersteps over
snapshot-versioned state tables.

Each iteration is ONE declarative DataFrame DAG (SURVEY §3.3):

    batch   = pending frontier
                → per-host admission window (politeness budget, P1)
                → global priority top-K                       [shuffle: by host]
    fetched = batch ⟕ pages (synthetic fetch, broadcast batch)
                ⟕ pages (one redirect hop) ⟕ robots (broadcast)
    docs    = success rows → extract_udf (Arrow-batched)      [no shuffle]
    cands   = posexplode(links) → resolve/canonicalize UDF
                → native filter chain → scorer column
                → within-iteration dedup (window by canon)
                → anti-join seen                              [shuffle: by url]
    commit  : frontier ⊖ batch ⊕ updates ⊕ trimmed new, seen ⊕ new,
              docs ⊕ extracted, host-state backoff/decay, crawl log.

Scale design: the frontier/seen anti-join shuffles only (url, hash)
pairs; the admission window bounds per-iteration work to
global_budget regardless of frontier size; hot-host skew is bounded
FIRST by the per-host budget (the politeness cap is the primary skew
control, SURVEY §4.2.2) and residual skew is AQE's job.  Ordering
parity with the reference is deterministic: (score, depth, seq)
priority with seq = discovery order, no timestamps.

Parity oracle: crawl4ai_spark.testing.simulator implements identical
semantics sequentially; tests assert equality of admitted sets, crawl
order, seen set, docs spans and host-state trajectories.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import StringType

from crawl4ai_spark.extraction.udfs import extract_udf
from crawl4ai_spark.functions.specs import compile_filters_column, compile_scorer_column
from crawl4ai_spark.functions.filters import valid_crawl_url
from crawl4ai_spark.functions.udfs import canonicalize_udf, host_udf
from crawl4ai_spark.functions.urlnorm import canonicalize_for_crawl, get_host, is_valid_crawl_url
from crawl4ai_spark.plans.config import BACKOFF_CODES, CrawlConfig
from crawl4ai_spark.plans.state import SnapshotStore
from crawl4ai_spark.sources.robots import make_can_fetch_udf


@pandas_udf(StringType())
def resolve_abs_udf(href: pd.Series, base: pd.Series) -> pd.Series:
    """Absolute resolution of a raw href against the page URL — the
    form the reference applies filters to (link_discovery passes the
    scraped absolute href to can_process_url)."""
    from urllib.parse import urljoin

    return pd.Series(
        [urljoin(b, h.strip()) if isinstance(h, str) and isinstance(b, str) else None
         for h, b in zip(href, base)],
        dtype=object,
    )


@dataclass
class CrawlState:
    """Driver-side loop state (persisted in the store manifest)."""
    iteration: int = 0
    next_seq: int = 0
    pages_crawled: int = 0
    host_state: dict[str, tuple[float, int]] = field(default_factory=dict)


@dataclass
class CrawlResultTables:
    frontier: DataFrame
    seen: DataFrame
    docs: DataFrame
    crawl_log: DataFrame
    state: CrawlState


class CrawlEngine:
    """Iterative distributed crawler over a pages source table.

    `pages` must be a materialized source (parquet-backed or cached):
    it is joined every iteration.  `robots` is a small dim table
    (host, rules) — broadcast."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        pages: DataFrame,
        robots: DataFrame | None = None,
        store: SnapshotStore | None = None,
        checkpoint_every: int = 1,
    ) -> None:
        self.spark = spark
        self.cfg = cfg
        self.pages = pages
        self.robots = robots
        self.store = store
        self.checkpoint_every = checkpoint_every
        self._can_fetch = make_can_fetch_udf(cfg.user_agent)
        self._order = (
            [F.asc("score"), F.asc("depth"), F.asc("seq")]
            if cfg.mode == "best_first"
            else [F.asc("seq")]
        )

    # ── schema helpers ───────────────────────────────────────────────
    _FRONTIER_COLS = "url string, url_hash long, host string, depth int, score double, parent_url string, seq long, status string, retry_count int, enqueue_iter int"
    _SEEN_COLS = "url string, url_hash long, first_iter int"
    _DOCS_COLS = (
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "raw_markdown string, markdown_with_citations string, references_markdown string, "
        "metadata map<string,string>, iteration int"
    )
    _LOG_COLS = "iteration int, url string, depth int, score double, parent_url string, seq long, outcome string, batch_rank int"

    def _empty(self, schema: str) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    # ── seeds ────────────────────────────────────────────────────────
    def _seed_frontier(self, seeds: list[str]) -> tuple[DataFrame, DataFrame, CrawlState]:
        state = CrawlState()
        rows = []
        seen_rows = []
        for s in seeds:
            canon = canonicalize_for_crawl(s, s)
            if not canon or not is_valid_crawl_url(canon):
                continue
            if any(r[0] == canon for r in rows):
                continue
            rows.append((canon, None, get_host(canon), 0, 0.0, None, state.next_seq,
                         "pending", 0, 0))
            seen_rows.append((canon, None, 0))
            state.next_seq += 1
        frontier = self.spark.createDataFrame(rows, self._FRONTIER_COLS).withColumn(
            "url_hash", F.xxhash64("url")
        )
        seen = self.spark.createDataFrame(seen_rows, self._SEEN_COLS).withColumn(
            "url_hash", F.xxhash64("url")
        )
        return frontier, seen, state

    # ── main loop ────────────────────────────────────────────────────
    def run(self, seeds: list[str]) -> CrawlResultTables:
        frontier, seen, state = self._seed_frontier(seeds)
        docs = self._empty(self._DOCS_COLS)
        log = self._empty(self._LOG_COLS)
        return self._loop(frontier, seen, docs, log, state)

    def resume(self) -> CrawlResultTables:
        """Continue from the store's latest committed snapshot
        (north rule: resumable from checkpoint)."""
        assert self.store is not None, "resume requires a SnapshotStore"
        m = self.store.read_manifest()
        assert m, "no committed snapshot to resume from"
        st = m["state"]
        state = CrawlState(
            iteration=st["iteration"],
            next_seq=st["next_seq"],
            pages_crawled=st["pages_crawled"],
            host_state={h: (d, f) for h, (d, f) in st["host_state"].items()},
        )
        frontier = self.store.load(self.spark, "frontier")
        seen = self.store.load(self.spark, "seen")
        docs = self.store.load(self.spark, "docs")
        log = self.store.load(self.spark, "crawl_log")
        return self._loop(frontier, seen, docs, log, state)

    def _loop(self, frontier, seen, docs, log, state) -> CrawlResultTables:
        cfg = self.cfg
        while state.iteration < cfg.max_iterations and state.pages_crawled < cfg.max_pages:
            out = self._iterate(frontier, seen, docs, log, state)
            if out is None:
                break
            frontier, seen, docs, log = out
            if self.store and state.iteration % self.checkpoint_every == 0:
                self._commit(frontier, seen, docs, log, state)
        if self.store:
            self._commit(frontier, seen, docs, log, state)
        return CrawlResultTables(frontier, seen, docs, log, state)

    def _commit(self, frontier, seen, docs, log, state) -> None:
        self.store.commit(
            snapshot_id=state.iteration,
            tables={"frontier": frontier, "seen": seen, "docs": docs, "crawl_log": log},
            metrics={"pages_crawled": state.pages_crawled,
                     "frontier_size": frontier.count(), "seen_size": seen.count()},
            state={"iteration": state.iteration, "next_seq": state.next_seq,
                   "pages_crawled": state.pages_crawled,
                   "host_state": {h: list(v) for h, v in state.host_state.items()}},
        )

    # ── one superstep ────────────────────────────────────────────────
    def _iterate(self, frontier, seen, docs, log, state):
        cfg = self.cfg
        spark = self.spark
        iteration = state.iteration + 1

        pending = frontier.filter(F.col("status") == "pending")

        # BFS: whole current level is the candidate set (O2)
        if cfg.mode == "bfs":
            level_row = pending.agg(F.min("depth").alias("d")).collect()
            if not level_row or level_row[0]["d"] is None:
                return None
            pending = pending.filter(F.col("depth") == int(level_row[0]["d"]))

        # ── politeness admission window (P1): per-host budget rank,
        #    then global priority top-K ─────────────────────────────
        budgets = [(h, cfg.host_budget(d)) for h, (d, _f) in state.host_state.items()]
        cands = pending
        if budgets:
            bdf = spark.createDataFrame(budgets, "host string, budget int")
            cands = cands.join(F.broadcast(bdf), "host", "left")
        else:
            cands = cands.withColumn("budget", F.lit(None).cast("int"))
        cands = cands.withColumn("budget", F.coalesce("budget", F.lit(cfg.base_budget)))

        host_rank = F.row_number().over(Window.partitionBy("host").orderBy(*self._order))
        remaining = cfg.max_pages - state.pages_crawled
        global_budget = min(cfg.global_budget, remaining)
        batch = (
            cands.withColumn("host_rank", host_rank)
            .filter(F.col("host_rank") <= F.col("budget"))
            .orderBy(*self._order)
            .limit(global_budget)
            .withColumn("batch_rank", F.row_number().over(Window.orderBy(*self._order)))
            .drop("budget", "host_rank")
        )
        batch = batch.localCheckpoint(eager=True)
        if batch.isEmpty():
            return None
        state.iteration = iteration

        # ── synthetic fetch: batch ⟕ pages, one redirect hop (S5/S7) ─
        p = self.pages.select("url", "status_code", "redirect_to", "html")
        p2 = self.pages.select(
            F.col("url").alias("rt_url"),
            F.col("status_code").alias("rt_status"),
            F.col("html").alias("rt_html"),
        )
        fetched = (
            batch.join(p, "url", "left")
            .join(p2, F.col("redirect_to") == F.col("rt_url"), "left")
        )
        is_redirect = (F.col("status_code") == 301) & F.col("redirect_to").isNotNull()
        fetched = fetched.select(
            *[F.col(c) for c in batch.columns],
            F.when(is_redirect, F.coalesce("rt_status", F.lit(0)))
             .otherwise(F.coalesce("status_code", F.lit(0))).alias("eff_status"),
            F.when(is_redirect, F.col("rt_html")).otherwise(F.col("html")).alias("eff_html"),
            F.when(is_redirect, F.col("redirect_to")).otherwise(F.col("url")).alias("final_url"),
        )

        # robots gate (J4): broadcast dim join + vectorized evaluation
        if cfg.respect_robots and self.robots is not None:
            fetched = fetched.join(
                F.broadcast(self.robots.select("host", "rules")), "host", "left"
            ).withColumn(
                "robots_ok",
                F.col("rules").isNull() | (F.trim("rules") == "") |
                self._can_fetch(F.col("rules"), F.col("url")),
            ).drop("rules")
        else:
            fetched = fetched.withColumn("robots_ok", F.lit(True))

        backoff = F.col("eff_status").isin(list(BACKOFF_CODES))
        fetched = fetched.withColumn(
            "outcome",
            F.when(~F.col("robots_ok"), F.lit("robots_blocked"))
            .when(F.col("eff_status") == 200, F.lit("success"))
            .when(backoff & (F.col("retry_count") < cfg.max_retries), F.lit("retry"))
            .when(backoff, F.lit("gave_up"))
            .otherwise(F.lit("fetch_error")),
        ).localCheckpoint(eager=True)

        # ── counters + host-state deltas (A4; driver-side, tiny) ─────
        agg = fetched.groupBy("host").agg(
            F.sum(F.when(F.col("outcome") == "success", 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("outcome").isin("retry", "gave_up"), 1).otherwise(0)).alias("bad"),
        ).collect()
        n_success = sum(r["ok"] for r in agg)
        state.pages_crawled += int(n_success)
        for r in agg:
            delay, fails = state.host_state.get(r["host"], (cfg.base_delay, 0))
            if r["bad"] > 0:
                state.host_state[r["host"]] = (min(cfg.max_delay, delay * cfg.backoff_factor), fails + 1)
            elif r["ok"] > 0:
                state.host_state[r["host"]] = (max(cfg.base_delay, delay * cfg.decay_factor), 0)

        # ── extraction (E1-E4, fused Arrow UDF) on success rows ──────
        success = fetched.filter(F.col("outcome") == "success")
        extracted = success.withColumn(
            "ex", extract_udf(F.col("url"), F.col("eff_html"))
        ).localCheckpoint(eager=True)

        new_docs = extracted.select(
            F.col("url").alias("doc_id"),
            F.col("ex.spans").alias("spans"),
            F.col("ex.raw_markdown").alias("raw_markdown"),
            F.col("ex.markdown_with_citations").alias("markdown_with_citations"),
            F.col("ex.references_markdown").alias("references_markdown"),
            F.col("ex.metadata").alias("metadata"),
            F.lit(iteration).alias("iteration"),
        )

        # ── link discovery → scored candidate set (SURVEY §3.3) ──────
        can_discover = (
            state.pages_crawled < cfg.max_pages
        )
        new_entries = None
        new_seen = None
        if can_discover:
            links = (
                extracted.filter(F.col("depth") + 1 <= cfg.max_depth)
                .select(
                    F.col("url").alias("parent_url"),
                    F.col("batch_rank"),
                    F.col("final_url"),
                    (F.col("depth") + 1).alias("depth"),
                    F.posexplode(F.col("ex.links")).alias("link_pos", "link"),
                )
                .select(
                    "parent_url", "batch_rank", "final_url", "depth", "link_pos",
                    F.col("link.href").alias("href"),
                )
            )
            cands = (
                links.withColumn("abs_url", resolve_abs_udf("href", "final_url"))
                .withColumn("canon", canonicalize_udf("href", "final_url"))
                .filter(F.col("canon").isNotNull() & valid_crawl_url(F.col("abs_url")))
            )
            if cfg.filters:
                cands = cands.filter(compile_filters_column(cfg.filters, F.col("abs_url")))
            cands = cands.withColumn("host", host_udf("canon"))
            if cfg.respect_robots and self.robots is not None:
                cands = cands.join(
                    F.broadcast(self.robots.select("host", "rules")), "host", "left"
                ).filter(
                    F.col("rules").isNull() | (F.trim("rules") == "") |
                    self._can_fetch(F.col("rules"), F.col("canon"))
                ).drop("rules")
            cands = cands.withColumn(
                "score", compile_scorer_column(cfg.scorer, F.col("canon")).cast("double")
            )
            if cfg.score_threshold > float("-inf"):
                cands = cands.filter(F.col("score") >= cfg.score_threshold)

            # within-iteration dedup: first discovery wins (J7)
            w = Window.partitionBy("canon").orderBy("batch_rank", "link_pos")
            deduped = (
                cands.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
            # seen-set dedup: exact anti-join (J1) — ground truth
            fresh = deduped.join(
                seen.select(F.col("url").alias("canon")), "canon", "left_anti"
            ).localCheckpoint(eager=True)

            # ALL valid fresh candidates enter seen (pre-trim quirk,
            # bfs_strategy.py:121-131)
            new_seen = fresh.select(
                F.col("canon").alias("url"),
                F.xxhash64("canon").alias("url_hash"),
                F.lit(iteration).alias("first_iter"),
            )

            # capacity trim (O4)
            capacity = cfg.max_pages - state.pages_crawled
            n_new = fresh.count()
            kept = fresh
            if n_new > capacity:
                if cfg.mode == "bfs" and cfg.scorer is not None:
                    tw = Window.orderBy(F.desc("score"), F.asc("batch_rank"), F.asc("link_pos"))
                else:
                    tw = Window.orderBy(F.asc("batch_rank"), F.asc("link_pos"))
                kept = (
                    fresh.withColumn("trim_rank", F.row_number().over(tw))
                    .filter(F.col("trim_rank") <= capacity)
                    .drop("trim_rank")
                )
            # seq = discovery order (deterministic FIFO tiebreak, O9)
            sw = Window.orderBy(F.asc("batch_rank"), F.asc("link_pos"))
            new_entries = kept.select(
                F.col("canon").alias("url"),
                F.xxhash64("canon").alias("url_hash"),
                F.col("host"),
                F.col("depth"),
                F.col("score"),
                F.col("parent_url"),
                (F.row_number().over(sw) + F.lit(state.next_seq - 1)).cast("long").alias("seq"),
                F.lit("pending").alias("status"),
                F.lit(0).alias("retry_count"),
                F.lit(iteration).alias("enqueue_iter"),
            ).localCheckpoint(eager=True)
            state.next_seq += new_entries.count()

        # ── frontier/seen/log merge (the MERGE INTO stand-in) ────────
        updated = fetched.select(
            "url", "url_hash", "host", "depth", "score", "parent_url", "seq",
            F.when(F.col("outcome") == "success", F.lit("done"))
            .when(F.col("outcome") == "retry", F.lit("pending"))
            .otherwise(F.lit("failed")).alias("status"),
            F.when(F.col("outcome") == "retry", F.col("retry_count") + 1)
            .otherwise(F.col("retry_count")).alias("retry_count"),
            "enqueue_iter",
        )
        frontier_next = frontier.join(batch.select("url"), "url", "left_anti").select(
            updated.columns
        ).unionByName(updated)
        if new_entries is not None:
            frontier_next = frontier_next.unionByName(new_entries)
        seen_next = seen.unionByName(new_seen) if new_seen is not None else seen
        log_next = log.unionByName(
            fetched.select(
                F.lit(iteration).alias("iteration"), "url", "depth", "score",
                "parent_url", "seq", "outcome", "batch_rank",
            )
        )
        docs_next = docs.unionByName(new_docs)

        frontier_next = frontier_next.localCheckpoint(eager=True)
        seen_next = seen_next.localCheckpoint(eager=True)
        docs_next = docs_next.localCheckpoint(eager=True)
        log_next = log_next.localCheckpoint(eager=True)
        return frontier_next, seen_next, docs_next, log_next
