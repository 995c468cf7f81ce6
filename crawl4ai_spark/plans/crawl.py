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

import time
from dataclasses import dataclass, field
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

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


LINK_PREP = StructType(
    [
        StructField("abs_url", StringType()),
        StructField("canon", StringType()),
        StructField("host", StringType()),
        StructField("robots_ok", BooleanType()),
    ]
)


def make_link_prep_udf(robots_map: dict[str, str] | None, user_agent: str):
    """ONE fused pandas UDF for all per-link Python work: absolute
    resolution, canonicalization, host extraction, robots evaluation.

    Fusing matters: every separate pandas UDF in a stage is its own
    ArrowEvalPython node with its own Python worker per task — four
    chained UDFs at 32 tasks means ~128 concurrent Python processes
    and the stage runs slower than single-threaded.  One node keeps
    it at one worker per task.

    robots_map is the collected (host → rules) dim — small by
    assumption here (broadcast closure); at 10^8-host scale this
    reverts to the dim-table join + UDF evaluation path."""
    from urllib.parse import urljoin

    from crawl4ai_spark.sources.robots import build_parser

    @pandas_udf(LINK_PREP)
    def link_prep_udf(href: pd.Series, base: pd.Series) -> pd.DataFrame:
        parsers: dict[str, object] = {}
        rows = []
        for h, b in zip(href, base):
            if not isinstance(h, str) or not isinstance(b, str):
                rows.append((None, None, None, True))
                continue
            abs_url = urljoin(b, h.strip())
            canon = canonicalize_for_crawl(h, b)
            host = get_host(canon) if canon else None
            ok = True
            if robots_map is not None and host:
                rules = robots_map.get(host)
                if rules and rules.strip():
                    p = parsers.get(host)
                    if p is None:
                        p = build_parser(rules)
                        parsers[host] = p
                    ok = bool(p.can_fetch(user_agent, canon))
            rows.append((abs_url, canon, host, ok))
        return pd.DataFrame(rows, columns=["abs_url", "canon", "host", "robots_ok"])

    return link_prep_udf


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
        verbose_timing: bool = False,
        materialize_outputs: bool = False,
    ) -> None:
        self.spark = spark
        self.cfg = cfg
        self.pages = pages
        self.robots = robots
        self.store = store
        self.checkpoint_every = checkpoint_every
        self.verbose_timing = verbose_timing
        # Materialize per-iteration docs/log parts eagerly: releases the
        # big fetched/extracted checkpoints for GC at the cost of two
        # extra jobs per iteration.  Worth it on long runs / small
        # heaps; off by default (lazy parts pin ~100-200 MB/iteration,
        # fine inside a 24g driver for bench-scale runs).
        self.materialize_outputs = materialize_outputs
        self._can_fetch = make_can_fetch_udf(cfg.user_agent)
        robots_map = None
        if cfg.respect_robots and robots is not None:
            robots_map = {r["host"]: r["rules"] for r in robots.select("host", "rules").collect()}
        self._link_prep = make_link_prep_udf(robots_map, cfg.user_agent)
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

    @staticmethod
    def _union_parts(base: DataFrame, parts: list[DataFrame]) -> DataFrame:
        out = base
        for p in parts:
            out = out.unionByName(p)
        return out

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
        # docs/crawl_log are append-only and never read inside the loop:
        # accumulate per-iteration parts, union at commit/return time
        # (no per-iteration re-materialization of the growing tables).
        docs_parts: list[DataFrame] = []
        log_parts: list[DataFrame] = []
        while state.iteration < cfg.max_iterations and state.pages_crawled < cfg.max_pages:
            out = self._iterate(frontier, seen, state)
            if out is None:
                break
            frontier, seen, new_docs, new_log = out
            docs_parts.append(new_docs)
            log_parts.append(new_log)
            if self.store and state.iteration % self.checkpoint_every == 0:
                docs = self._union_parts(docs, docs_parts).localCheckpoint(eager=True)
                log = self._union_parts(log, log_parts).localCheckpoint(eager=True)
                docs_parts, log_parts = [], []
                self._commit(frontier, seen, docs, log, state)
        docs = self._union_parts(docs, docs_parts)
        log = self._union_parts(log, log_parts)
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
    def _iterate(self, frontier, seen, state):
        cfg = self.cfg
        spark = self.spark
        iteration = state.iteration + 1

        tmark = time.time()
        timings: dict[str, float] = {}

        def _mark(label: str) -> None:
            nonlocal tmark
            now = time.time()
            timings[label] = round(now - tmark, 2)
            tmark = now

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
        remaining = cfg.max_pages - state.pages_crawled
        global_budget = min(cfg.global_budget, remaining)

        # Fast path: when every host budget ≥ the global budget the
        # per-host cap provably cannot change the admitted set (any row
        # ranked past its host cap is also past the global cut) — skip
        # the extra shuffle+window.  This is the throughput-bench mode.
        min_budget = min([b for _h, b in budgets], default=cfg.base_budget)
        cap_can_bind = min(min_budget, cfg.base_budget) < global_budget
        if cap_can_bind:
            cands = pending
            if budgets:
                bdf = spark.createDataFrame(budgets, "host string, budget int")
                cands = cands.join(F.broadcast(bdf), "host", "left")
            else:
                cands = cands.withColumn("budget", F.lit(None).cast("int"))
            cands = cands.withColumn("budget", F.coalesce("budget", F.lit(cfg.base_budget)))
            host_rank = F.row_number().over(Window.partitionBy("host").orderBy(*self._order))
            cands = (
                cands.withColumn("host_rank", host_rank)
                .filter(F.col("host_rank") <= F.col("budget"))
                .drop("budget", "host_rank")
            )
        else:
            cands = pending
        batch = (
            cands.orderBy(*self._order)
            .limit(global_budget)
            .withColumn("batch_rank", F.row_number().over(Window.orderBy(*self._order)))
        )
        batch = batch.localCheckpoint(eager=True)
        _mark("admission")
        state.iteration = iteration

        # ── synthetic fetch: batch ⟕ pages, one redirect hop (S5/S7).
        # Join strategy: the batch (small) is ALWAYS the broadcast/build
        # side — the pages corpus (the wide html column) must never
        # shuffle.  pages ⋉ broadcast(batch) is a scan + hash filter;
        # the right-outer then broadcasts the batch again so the hit
        # set streams.  (At production scale this join is replaced by
        # the network fetch UDF; the shape stays batch-small.)
        p = self.pages.select("url", "status_code", "redirect_to", "html")
        hits = p.join(F.broadcast(batch.select("url")), "url", "left_semi")
        fetched = hits.join(F.broadcast(batch), "url", "right_outer")

        rt_urls = (
            fetched.filter((F.col("status_code") == 301) & F.col("redirect_to").isNotNull())
            .select(F.col("redirect_to").alias("rt_url"))
        )
        p2 = (
            p.join(F.broadcast(rt_urls), p.url == F.col("rt_url"), "left_semi")
            .select(
                F.col("url").alias("rt_url"),
                F.col("status_code").alias("rt_status"),
                F.col("html").alias("rt_html"),
            )
        )
        fetched = fetched.join(
            F.broadcast(p2), F.col("redirect_to") == F.col("rt_url"), "left"
        )
        # Spread the fetched batch evenly BEFORE the heavy Python
        # stages.  The broadcast join leaves it on the pages table's
        # partitioning, and an iteration's admitted URLs cluster in
        # page-id space (a crawl wave discovers neighbors), so without
        # this one or two partitions hold most of the batch and the
        # extract stage runs as a straggler (observed: 15 idle executor
        # threads + 1 Python reader).  Partitioning is (host, salt):
        # host-locality for connection reuse/pacing in a real fetch
        # UDF, salted so a hot host can't serialize an iteration
        # (SURVEY §4.2.1-2).
        n_parts = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        fetched = fetched.repartition(
            n_parts, F.col("host"), F.pmod(F.coalesce("url_hash", F.lit(0)), F.lit(4 * n_parts))
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
        _mark("fetch")

        # ── counters + host-state deltas (A4; driver-side, tiny) ─────
        agg = fetched.groupBy("host").agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("outcome") == "success", 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("outcome").isin("retry", "gave_up"), 1).otherwise(0)).alias("bad"),
        ).collect()
        if not agg:  # empty batch — frontier exhausted (replaces isEmpty job)
            state.iteration = iteration - 1
            return None
        n_success = sum(r["ok"] for r in agg)
        state.pages_crawled += int(n_success)
        for r in agg:
            delay, fails = state.host_state.get(r["host"], (cfg.base_delay, 0))
            if r["bad"] > 0:
                state.host_state[r["host"]] = (min(cfg.max_delay, delay * cfg.backoff_factor), fails + 1)
            elif r["ok"] > 0:
                state.host_state[r["host"]] = (max(cfg.base_delay, delay * cfg.decay_factor), 0)
        _mark("host_agg")

        # ── extraction (E1-E4, fused Arrow UDF) on success rows ──────
        success = fetched.filter(F.col("outcome") == "success")
        # project eff_html OUT before materializing: the extract struct
        # is the only thing downstream needs, and html is the widest
        # column in the pipeline
        extracted = success.select(
            "url", "batch_rank", "depth", "final_url",
            extract_udf(F.col("url"), F.col("eff_html")).alias("ex"),
        ).localCheckpoint(eager=True)
        _mark("extract")

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
                links.withColumn("p", self._link_prep("href", "final_url"))
                .select(
                    "parent_url", "batch_rank", "link_pos", "depth",
                    F.col("p.abs_url").alias("abs_url"),
                    F.col("p.canon").alias("canon"),
                    F.col("p.host").alias("host"),
                    F.col("p.robots_ok").alias("robots_ok"),
                )
                .filter(
                    F.col("canon").isNotNull()
                    & valid_crawl_url(F.col("abs_url"))
                    & F.col("robots_ok")
                )
                .drop("robots_ok")
            )
            if cfg.filters:
                cands = cands.filter(compile_filters_column(cfg.filters, F.col("abs_url")))
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
            _mark("candidates")

            # ALL valid fresh candidates enter seen (pre-trim quirk,
            # bfs_strategy.py:121-131)
            new_seen = fresh.select(
                F.col("canon").alias("url"),
                F.xxhash64("canon").alias("url_hash"),
                F.lit(iteration).alias("first_iter"),
            )

            # capacity trim (O4) — rank-based filter, no count job; the
            # predicate is a no-op whenever capacity exceeds the fresh
            # set, so applying it unconditionally is always correct.
            capacity = cfg.max_pages - state.pages_crawled
            if cfg.mode == "bfs" and cfg.scorer is not None:
                tw = Window.orderBy(F.desc("score"), F.asc("batch_rank"), F.asc("link_pos"))
            else:
                tw = Window.orderBy(F.asc("batch_rank"), F.asc("link_pos"))
            kept = (
                fresh.withColumn("trim_rank", F.row_number().over(tw))
                .filter(F.col("trim_rank") <= capacity)
                .drop("trim_rank")
            )
            # seq = (iteration << 32) + discovery index: deterministic
            # FIFO tiebreak (O9) without a driver count — iterations are
            # monotone, so ordering by seq ≡ ordering by (enqueue_iter,
            # discovery order), exactly as a global counter would.
            sw = Window.orderBy(F.asc("batch_rank"), F.asc("link_pos"))
            seq_base = F.shiftleft(F.lit(int(iteration)).cast("long"), 32)
            new_entries = kept.select(
                F.col("canon").alias("url"),
                F.xxhash64("canon").alias("url_hash"),
                F.col("host"),
                F.col("depth"),
                F.col("score"),
                F.col("parent_url"),
                (seq_base + F.row_number().over(sw) - 1).cast("long").alias("seq"),
                F.lit("pending").alias("status"),
                F.lit(0).alias("retry_count"),
                F.lit(iteration).alias("enqueue_iter"),
            )  # derived from the checkpointed `fresh` — cheap to recompute
            _mark("trim_seq")

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
        new_log = fetched.select(
            F.lit(iteration).alias("iteration"), "url", "depth", "score",
            "parent_url", "seq", "outcome", "batch_rank",
        )
        if self.materialize_outputs:
            new_log = new_log.localCheckpoint(eager=True)

        frontier_next = frontier_next.localCheckpoint(eager=True)
        seen_next = seen_next.localCheckpoint(eager=True)
        _mark("merge")
        if self.verbose_timing:
            print(f"[iter {iteration}] " + " ".join(f"{k}={v}s" for k, v in timings.items()))
        return frontier_next, seen_next, new_docs, new_log
