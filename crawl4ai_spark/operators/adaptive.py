"""Adaptive-crawl stopping metrics (A6/A7).

Clean-room re-expression of the reference's adaptive crawler
statistics (/root/reference/crawl4ai/adaptive_crawler.py:287-389,
526-591): term/document frequencies over the growing knowledge base,
then

  coverage    = √(avg per-term df/N · (1 + 0.5·log-normalized tf))
  consistency = avg pairwise Jaccard of document term sets
  saturation  = 1 − recent-new-term rate / initial-new-term rate
  confidence  = 0.4·coverage + 0.3·consistency + 0.3·saturation

Everything is a DataFrame aggregate; pairwise Jaccard uses the
shingle-join pattern (never a cross join) and caps the compared pair
count like the reference samples pairs at scale.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.functions.bm25 import tokenize


def term_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(term, tf, df) over the corpus — A6."""
    toks = docs.select(F.col(id_col), F.explode(tokenize(text_col)).alias("term"))
    return toks.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.countDistinct(id_col).alias("df"),
    )


def coverage(docs: DataFrame, query_terms: list[str],
             text_col: str = "text", id_col: str = "doc_id") -> float:
    """√(avg_t df_t/N · (1 + 0.5·min(1, ln(1+tf_t)/ln(10)))) over the
    query terms (adaptive_crawler.py:287-330 semantics)."""
    n = docs.count()
    if n == 0 or not query_terms:
        return 0.0
    stats = term_stats(docs, text_col, id_col).filter(F.col("term").isin(query_terms))
    rows = {r["term"]: (r["tf"], r["df"]) for r in stats.collect()}
    total = 0.0
    for t in query_terms:
        tf, df = rows.get(t, (0, 0))
        tf_norm = min(1.0, math.log(1 + tf) / math.log(10)) if tf else 0.0
        total += (df / n) * (1 + 0.5 * tf_norm)
    return math.sqrt(total / len(query_terms))


def consistency(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                max_pairs: int = 10_000, max_df: int | None = None) -> float:
    """Avg pairwise Jaccard of document term SETS via inverted-index
    join (adaptive_crawler.py:331-360 semantics).  Pairs sharing no
    term contribute 0 and are counted in the denominator.

    `max_df` is the hot-term scale guard (same pattern as
    `dedup.jaccard_pairs`): candidate pairs come only from terms with
    document frequency ≤ max_df, so a stop word appearing in k docs
    can no longer contribute k² join rows; each candidate pair's
    Jaccard is then still EXACT over the full term sets
    (candidate-driven double equi-join).  Pairs whose overlap is ONLY
    hot terms are treated as 0 — a conservative (under-)estimate of
    consistency, which biases the confidence stop later, never
    earlier.  None (default) keeps the exact all-sharing-pairs join —
    fine for adaptive KBs (hundreds of docs), not for open corpora."""
    n = docs.count()
    if n < 2:
        return 1.0 if n == 1 else 0.0
    terms = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokenize(text_col))).alias("term")
    )
    sizes = terms.groupBy(id_col).agg(F.count("*").alias("sz"))
    if max_df is not None:
        dfreq = terms.groupBy("term").agg(F.count("*").alias("_df"))
        rare = terms.join(
            dfreq.filter(F.col("_df") <= max_df).select("term"), "term", "left_semi"
        )
        cand = (
            rare.alias("x").join(rare.alias("y"), "term")
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .select(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
            .distinct()
            .limit(max_pairs)
        )
        pair_i = (
            cand.join(terms.select(F.col(id_col).alias("a"), "term"), "a")
            .join(terms.select(F.col(id_col).alias("b"), "term"), ["b", "term"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("i"))
        )
    else:
        pair_i = (
            terms.alias("x").join(terms.alias("y"), "term")
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .groupBy(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
            .agg(F.count("*").alias("i"))
            .limit(max_pairs)
        )
    inter = (
        pair_i
        .join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("na")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("nb")), "b")
        .withColumn("j", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
    )
    s = inter.agg(F.sum("j").alias("s")).collect()[0]["s"] or 0.0
    total_pairs = n * (n - 1) // 2
    return float(s) / total_pairs if total_pairs else 0.0


def saturation(new_terms_history: list[int]) -> float:
    """1 − recent/initial new-term rate (adaptive_crawler.py:361-380):
    history = new distinct terms contributed by each crawled batch."""
    if len(new_terms_history) < 2:
        return 0.0
    k = max(1, len(new_terms_history) // 3)
    initial = sum(new_terms_history[:k]) / k
    recent = sum(new_terms_history[-k:]) / k
    if initial <= 0:
        return 1.0
    return max(0.0, min(1.0, 1.0 - recent / initial))


def confidence(cov: float, cons: float, sat: float) -> float:
    """0.4·coverage + 0.3·consistency + 0.3·saturation
    (adaptive_crawler.py:381-389)."""
    return 0.4 * cov + 0.3 * cons + 0.3 * sat


def new_terms_per_iteration(docs: DataFrame, text_col: str = "text",
                            iter_col: str = "iteration") -> list[int]:
    """New-distinct-term count contributed by each crawl iteration —
    the input to `saturation`.  One pass: per term, the first
    iteration it appeared; then counts per iteration."""
    first = (
        docs.select(F.col(iter_col), F.explode(F.array_distinct(tokenize(text_col))).alias("term"))
        .groupBy("term").agg(F.min(iter_col).alias("first_iter"))
        .groupBy("first_iter").agg(F.count("*").alias("n_new"))
        .orderBy("first_iter")
        .collect()
    )
    if not first:
        return []
    by_iter = {r["first_iter"]: r["n_new"] for r in first}
    lo, hi = min(by_iter), max(by_iter)
    return [by_iter.get(i, 0) for i in range(lo, hi + 1)]


def _preview_terms(text_col) -> "F.Column":
    """Reference link-preview tokenizer (adaptive_crawler.py:516-525):
    lowercase, split on non-alphanumerics, DROP tokens of length ≤ 2,
    set semantics (distinct)."""
    toks = tokenize(text_col)
    return F.array_distinct(F.filter(toks, lambda w: F.length(w) > 2))


def adaptive_rank(
    links: DataFrame,
    kb: DataFrame,
    query: str,
    relevance_weight: float = 0.5,
    novelty_weight: float = 0.3,
    authority_weight: float = 0.2,
    authority: str = "constant",
    text_col: str = "text",
    id_col: str = "doc_id",
    url_col: str | None = None,
    kb_text_col: str = "text",
) -> DataFrame:
    """R11 — expected-information-gain link ranking, the reference's
    `rank_links` (adaptive_crawler.py:391-503) as one distributed plan:

      relevance = |query_terms ∩ preview_terms| / |query_terms|
                  (term-overlap path; the contextual-BM25 fast path is
                  functions.bm25 and composes upstream)
      novelty   = |preview_terms − KB_terms| / |preview_terms|
                  (0.5 when the preview has no terms; an empty KB
                  makes every term new → 1.0, matching the reference)
      authority = 1.0 ("constant", the reference's live behavior —
                  _calculate_authority is dead code there) or the
                  documented URL-structure heuristic ("url":
                  +0.2 docs/documentation, +0.2 api/reference,
                  +0.1 guide/tutorial, +0.1 .pdf, −0.3 images,
                  capped at 1.0, over `url_col`)
      adaptive_score = w_r·relevance + w_n·novelty + w_a·authority

    Scale shape: relevance is a pure Column (query terms are a
    literal); novelty is ONE term-keyed anti-join against the distinct
    KB dictionary (never collected — at 10^10 links and a 10^8-term
    dictionary both sides shuffle on `term`, no driver state).
    """
    qt = sorted(
        {t for t in re.split(r"[^a-z0-9]+", query.lower()) if len(t) > 2}
    )
    pt = _preview_terms(text_col)
    out = links.withColumn("_pt", pt)
    if qt:
        rel = (
            F.size(F.array_intersect(F.col("_pt"), F.array(*[F.lit(t) for t in qt])))
            / F.lit(float(len(qt)))
        )
    else:
        rel = F.lit(0.0)
    # novelty: explode distinct preview terms, anti-join the KB term
    # dictionary, count survivors per link
    lt = out.select(F.col(id_col), F.explode("_pt").alias("term"))
    kb_terms = kb.select(
        F.explode(_preview_terms(kb_text_col)).alias("term")
    ).distinct()
    n_new = (
        lt.join(kb_terms, "term", "left_anti")
        .groupBy(id_col)
        .agg(F.count("*").alias("_n_new"))
    )
    out = out.join(n_new, id_col, "left")
    novelty = F.when(F.size("_pt") == 0, F.lit(0.5)).otherwise(
        F.coalesce(F.col("_n_new"), F.lit(0)).cast("double") / F.size("_pt")
    )
    if authority == "url":
        u = F.lower(F.col(url_col or id_col))
        auth = (
            F.lit(0.5)
            + F.when(u.contains("/docs/") | u.contains("/documentation/"), 0.2).otherwise(0.0)
            + F.when(u.contains("/api/") | u.contains("/reference/"), 0.2).otherwise(0.0)
            + F.when(u.contains("/guide/") | u.contains("/tutorial/"), 0.1).otherwise(0.0)
            + F.when(u.endswith(".pdf"), 0.1)
            .when(u.endswith(".jpg") | u.endswith(".png") | u.endswith(".gif"), -0.3)
            .otherwise(0.0)
        )
        auth = F.least(auth, F.lit(1.0))
    else:
        auth = F.lit(1.0)
    return (
        out.withColumn("relevance", rel.cast("double"))
        .withColumn("novelty", novelty.cast("double"))
        .withColumn("authority", auth.cast("double"))
        .withColumn(
            "adaptive_score",
            F.lit(relevance_weight) * F.col("relevance")
            + F.lit(novelty_weight) * F.col("novelty")
            + F.lit(authority_weight) * F.col("authority"),
        )
        .drop("_pt", "_n_new")
    )
