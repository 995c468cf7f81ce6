"""Sequential adaptive-digest simulator — the parity oracle for
plans/adaptive.adaptive_digest.

Pure-Python, dict/set-based re-implementation of the same digest
semantics (reference adaptive_crawler.py:1266-1441 loop,
should_stop :505-525, rank_links :391-417, metric formulas as pinned
by operators/adaptive.py's goldens).  No Spark: this is the
independent implementation the engine must agree with on crawl order,
stop iteration, stop reason, and metric values.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _preview_terms(text: str) -> set[str]:
    return {t for t in _tokens(text) if len(t) > 2}


def _coverage(kb_texts: list[str], query_terms: list[str]) -> float:
    n = len(kb_texts)
    if n == 0 or not query_terms:
        return 0.0
    tf: dict[str, int] = {}
    df: dict[str, int] = {}
    for text in kb_texts:
        toks = _tokens(text)
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    total = 0.0
    for t in query_terms:
        tft, dft = tf.get(t, 0), df.get(t, 0)
        tf_norm = min(1.0, math.log(1 + tft) / math.log(10)) if tft else 0.0
        total += (dft / n) * (1 + 0.5 * tf_norm)
    return math.sqrt(total / len(query_terms))


def _consistency(kb_texts: list[str]) -> float:
    n = len(kb_texts)
    if n < 2:
        return 1.0 if n == 1 else 0.0
    sets = [set(_tokens(t)) for t in kb_texts]
    s = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            inter = len(sets[i] & sets[j])
            if inter:
                s += inter / len(sets[i] | sets[j])
    return s / (n * (n - 1) // 2)


def _saturation(history: list[int]) -> float:
    if len(history) < 2:
        return 0.0
    k = max(1, len(history) // 3)
    initial = sum(history[:k]) / k
    recent = sum(history[-k:]) / k
    if initial <= 0:
        return 1.0
    return max(0.0, min(1.0, 1.0 - recent / initial))


@dataclass
class SimDigestResult:
    crawl_order: list[str]
    metrics: dict[str, float]
    depth_reached: int
    stop_reason: str
    metrics_history: list[dict] = field(default_factory=list)


def simulate_digest(
    pages: dict[str, tuple[str, list[tuple[str, str]]]],
    start_url: str,
    query: str,
    confidence_threshold: float = 0.7,
    max_depth: int = 5,
    max_pages: int = 20,
    top_k_links: int = 3,
    min_gain_threshold: float = 0.1,
    saturation_threshold: float = 0.8,
    relevance_weight: float = 0.5,
    novelty_weight: float = 0.3,
    authority_weight: float = 0.2,
) -> SimDigestResult:
    """pages: url -> (text, [(href, link_text), ...])."""
    qt_cov = [t for t in _tokens(query) if len(t) > 2]      # dups kept (coverage)
    qt_rel = set(qt_cov)                                    # distinct (relevance)

    crawled: list[str] = []
    kb_texts: list[str] = []
    kb_iters: list[int] = []
    # pending: href -> (seq tuple, link_text) at FIRST discovery
    pending: dict[str, tuple[tuple[int, int, int], str]] = {}

    def merge(urls: list[str], iteration: int) -> None:
        for u in urls:
            text, links = pages[u]
            kb_texts.append(text)
            kb_iters.append(iteration)
            src_rank = crawled.index(u)
            for pos, (href, ltext) in enumerate(links):
                if href is None:
                    continue
                seq = (iteration, src_rank, pos)
                # keep the MIN-seq discovery and its text (engine:
                # groupBy href, min(seq), min_by(link_text, seq))
                if href not in pending or seq < pending[href][0]:
                    pending[href] = (seq, ltext or "")

    def new_terms_history() -> list[int]:
        first_iter: dict[str, int] = {}
        for text, it in zip(kb_texts, kb_iters):
            for t in set(_tokens(text)):
                if t not in first_iter or it < first_iter[t]:
                    first_iter[t] = it
        if not first_iter:
            return []
        counts: dict[int, int] = {}
        for it in first_iter.values():
            counts[it] = counts.get(it, 0) + 1
        lo, hi = min(counts), max(counts)
        return [counts.get(i, 0) for i in range(lo, hi + 1)]

    if start_url not in pages:
        return SimDigestResult([], {}, 0, "no_start")
    crawled.append(start_url)
    merge([start_url], 0)

    metrics: dict[str, float] = {}
    history: list[dict] = []
    depth = 0
    stop_reason = "max_depth"
    while depth < max_depth:
        cov = _coverage(kb_texts, qt_cov)
        cons = _consistency(kb_texts)
        sat = _saturation(new_terms_history())
        conf = 0.4 * cov + 0.3 * cons + 0.3 * sat
        metrics = {
            "coverage": cov, "consistency": cons,
            "saturation": sat, "confidence": conf,
        }
        history.append({"depth": depth, "pages": len(crawled), **metrics})

        cand = {h: v for h, v in pending.items() if h not in crawled}
        if conf >= confidence_threshold:
            stop_reason = "confidence"
            break
        if len(crawled) >= max_pages:
            stop_reason = "max_pages"
            break
        if not cand:
            stop_reason = "exhausted"
            break
        if sat >= saturation_threshold:
            stop_reason = "saturation"
            break

        kb_terms: set[str] = set()
        for text in kb_texts:
            kb_terms |= _preview_terms(text)
        scored = []
        for href, (seq, ltext) in cand.items():
            pt = _preview_terms(ltext)
            rel = (len(pt & qt_rel) / len(qt_rel)) if qt_rel else 0.0
            nov = 0.5 if not pt else len(pt - kb_terms) / len(pt)
            score = (relevance_weight * rel + novelty_weight * nov
                     + authority_weight * 1.0)
            scored.append((score, seq, href))
        scored.sort(key=lambda x: (-x[0], x[1]))
        top = scored[:top_k_links]
        if not top:
            stop_reason = "exhausted"
            break
        if top[0][0] < min_gain_threshold:
            stop_reason = "min_gain"
            break

        to_crawl = [h for _, _, h in top]
        got = [u for u in to_crawl if u in pages]
        crawled.extend(got)
        merge(got, depth + 1)
        depth += 1
    else:
        cov = _coverage(kb_texts, qt_cov)
        cons = _consistency(kb_texts)
        sat = _saturation(new_terms_history())
        metrics = {
            "coverage": cov, "consistency": cons, "saturation": sat,
            "confidence": 0.4 * cov + 0.3 * cons + 0.3 * sat,
        }

    metrics["pages_crawled"] = float(len(crawled))
    metrics["depth_reached"] = float(depth)
    return SimDigestResult(crawled, metrics, depth, stop_reason, history)
