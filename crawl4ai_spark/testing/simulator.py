"""Pure-Python crawl simulator — the parity oracle.

Implements EXACTLY the iteration semantics of plans.crawl (defined in
plans/config.py) using the same canonicalizer (functions.urlnorm),
the same extractor (extraction.udfs.extract_one), the same compiled
scorer/filter specs (functions.specs) and the same robots evaluator
(sources.robots) — sequentially, in plain dicts.  The Spark engine
must reproduce this simulator's admitted sets, crawl order, seen set,
host-state trajectory and per-document spans bit-for-bit; the
simulator in turn re-states the reference strategies
(bfs_strategy.py:142-192 / bff_strategy.py:129-213 /
async_dispatcher.py:28-85) at iteration granularity.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urljoin

from crawl4ai_spark.extraction.udfs import extract_one
from crawl4ai_spark.functions.specs import compile_filters_py, compile_scorer_py
from crawl4ai_spark.functions.urlnorm import (
    canonicalize_for_crawl,
    get_host,
    is_valid_crawl_url,
)
from crawl4ai_spark.plans.config import BACKOFF_CODES, CrawlConfig
from crawl4ai_spark.sources import robots as robots_mod


@dataclass
class FrontierEntry:
    url: str
    host: str
    depth: int
    score: float
    parent: str | None
    seq: int
    status: str = "pending"     # pending | done | failed
    retry_count: int = 0
    enqueue_iter: int = 0


@dataclass
class SimResult:
    crawl_order: list[dict] = field(default_factory=list)   # fetch events
    admitted_sets: list[list[str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    docs: dict[str, list[tuple]] = field(default_factory=dict)  # url → spans
    frontier: dict[str, FrontierEntry] = field(default_factory=dict)
    host_state: dict[str, tuple[float, int]] = field(default_factory=dict)
    pages_crawled: int = 0
    iterations: int = 0


def simulate_crawl(
    pages: dict[str, dict],
    robots: dict[str, str],
    seeds: list[str],
    cfg: CrawlConfig,
) -> SimResult:
    scorer = compile_scorer_py(cfg.scorer)
    filters = compile_filters_py(cfg.filters)
    robots_parsers = {h: robots_mod.build_parser(r) for h, r in robots.items()}

    def allowed_by_robots(url: str, host: str) -> bool:
        if not cfg.respect_robots:
            return True
        rules = robots.get(host)
        if not rules or not rules.strip():
            return True
        return robots_parsers[host].can_fetch(cfg.user_agent, url)

    res = SimResult()
    next_seq = 0

    # ── enqueue seeds (depth 0, score 0, seed-list order; reference:
    #    caller-supplied order, async_webcrawler.py:653) ──────────────
    for s in seeds:
        canon = canonicalize_for_crawl(s, s)
        if not canon or not is_valid_crawl_url(canon) or canon in res.seen:
            continue
        res.seen.add(canon)
        res.frontier[canon] = FrontierEntry(
            url=canon, host=get_host(canon), depth=0, score=0.0,
            parent=None, seq=next_seq, enqueue_iter=0,
        )
        next_seq += 1

    for iteration in range(1, cfg.max_iterations + 1):
        if res.pages_crawled >= cfg.max_pages:
            break
        pending = [e for e in res.frontier.values() if e.status == "pending"]
        if not pending:
            break

        # ── admission window ────────────────────────────────────────
        if cfg.mode == "bfs":
            level = min(e.depth for e in pending)
            cands = [e for e in pending if e.depth == level]
            cands.sort(key=lambda e: e.seq)
        elif cfg.mode == "dfs":
            # LIFO stack order (dfs_strategy.py:27-66): latest
            # iteration's discoveries first, first-discovered-first
            # within an iteration (the reference pushes reversed)
            cands = sorted(pending, key=lambda e: (-e.enqueue_iter, e.seq))
        else:
            cands = sorted(pending, key=lambda e: (e.score, e.depth, e.seq))
        if cfg.fairness_timeout_iters is not None:
            # O5 fairness aging (async_dispatcher.py:217-226):
            # starved entries get priority -wait, fresh ones
            # retry_count; stable sort keeps the mode order as tiebreak
            def fair(e: FrontierEntry) -> float:
                wait = iteration - e.enqueue_iter
                return float(-wait) if wait > cfg.fairness_timeout_iters else float(e.retry_count)

            cands = sorted(cands, key=fair)

        remaining = cfg.max_pages - res.pages_crawled
        global_budget = min(cfg.global_budget, remaining)
        per_host_count: dict[str, int] = {}
        admitted: list[FrontierEntry] = []
        for e in cands:
            if len(admitted) >= global_budget:
                break
            delay = res.host_state.get(e.host, (cfg.base_delay, 0))[0]
            if per_host_count.get(e.host, 0) >= cfg.host_budget(delay):
                continue
            per_host_count[e.host] = per_host_count.get(e.host, 0) + 1
            admitted.append(e)
        if not admitted:
            break
        res.iterations = iteration
        res.admitted_sets.append([e.url for e in admitted])

        # ── pass 1: fetch all admitted (iteration-granular barrier,
        #    matching the engine — SURVEY §7.4.2) ─────────────────────
        hosts_failed: set[str] = set()
        hosts_succeeded: set[str] = set()
        # (entry, final_url, html, batch_rank): batch_rank is the
        # 1-based admitted rank — it feeds the engine's arithmetic seq
        successes: list[tuple[FrontierEntry, str, str, int]] = []

        for rank, e in enumerate(admitted):
            row = pages.get(e.url)
            status_code = int(row["status_code"]) if row else 0
            final_url, html = e.url, (row["html"] if row else None)
            if row and status_code == 301 and row.get("redirect_to"):
                tgt = pages.get(row["redirect_to"])
                final_url = row["redirect_to"]
                status_code = int(tgt["status_code"]) if tgt else 0
                html = tgt["html"] if tgt else None

            if not allowed_by_robots(e.url, e.host):
                e.status = "failed"
                outcome = "robots_blocked"
            elif status_code == 200:
                e.status = "done"
                outcome = "success"
                res.pages_crawled += 1
                hosts_succeeded.add(e.host)
            elif status_code in BACKOFF_CODES:
                hosts_failed.add(e.host)
                if e.retry_count < cfg.max_retries:
                    e.retry_count += 1
                    outcome = "retry"
                else:
                    e.status = "failed"
                    outcome = "gave_up"
            else:
                e.status = "failed"
                outcome = "fetch_error"

            res.crawl_order.append(
                {"iteration": iteration, "url": e.url, "depth": e.depth,
                 "score": e.score, "parent_url": e.parent, "seq": e.seq,
                 "outcome": outcome}
            )

            if outcome == "success":
                successes.append((e, final_url, html, rank + 1))

        # ── pass 2: extract + discover from successes, in admitted
        #    order, gated by end-of-iteration page count ──────────────
        # (entry, score, batch_rank, link_pos)
        new_entries: list[tuple[FrontierEntry, float, int, int]] = []
        for e, final_url, html, batch_rank in successes:
            ex = extract_one(e.url, html)
            res.docs[e.url] = [
                (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in ex["spans"]
            ]
            next_depth = e.depth + 1
            if next_depth > cfg.max_depth:
                continue
            if res.pages_crawled >= cfg.max_pages:
                continue
            for link_pos, link in enumerate(ex["links"]):
                abs_url = urljoin(final_url, link["href"].strip())
                canon = canonicalize_for_crawl(link["href"], final_url)
                if not canon or canon in res.seen:
                    continue
                if not is_valid_crawl_url(abs_url):
                    continue
                if not filters(abs_url):
                    continue
                host = get_host(canon)
                if not allowed_by_robots(canon, host):
                    continue
                score = scorer(canon)
                if score < cfg.score_threshold:
                    continue
                res.seen.add(canon)           # pre-trim, like the reference
                entry = FrontierEntry(
                    url=canon, host=host, depth=next_depth, score=score,
                    parent=e.url, seq=-1, enqueue_iter=iteration,
                )
                new_entries.append((entry, score, batch_rank, min(link_pos, 65535)))

        # ── capacity trim (bfs_strategy.py:124-131 / bff :119-122) ──
        capacity = cfg.max_pages - res.pages_crawled
        if len(new_entries) > capacity:
            if cfg.mode == "bfs" and cfg.scorer is not None:
                order = sorted(range(len(new_entries)),
                               key=lambda i: (-new_entries[i][1], i))
                keep = sorted(order[: max(0, capacity)])
            else:
                keep = list(range(max(0, capacity)))
            new_entries = [new_entries[i] for i in keep]

        # seq = (iteration << 40) | (batch_rank << 16) | link_pos —
        # the engine's windowless arithmetic scheme.  Monotone in
        # discovery order (batch_rank, link_pos), so ordering-
        # equivalent to a global monotone counter.
        for entry, _score, br, lp in new_entries:
            entry.seq = (iteration << 40) | (br << 16) | lp
            res.frontier[entry.url] = entry

        # ── host-state update (async_dispatcher.py:65-85 semantics,
        #    deterministic factors, per-iteration granularity) ────────
        for h in hosts_failed:
            delay, fails = res.host_state.get(h, (cfg.base_delay, 0))
            res.host_state[h] = (min(cfg.max_delay, delay * cfg.backoff_factor), fails + 1)
        for h in hosts_succeeded - hosts_failed:
            delay, fails = res.host_state.get(h, (cfg.base_delay, 0))
            res.host_state[h] = (max(cfg.base_delay, delay * cfg.decay_factor), 0)

    return res
