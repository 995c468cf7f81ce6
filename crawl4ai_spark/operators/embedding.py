"""Embedding-strategy adaptive-crawl math (the reference's
`EmbeddingStrategy`) over deterministic hash embeddings.

Clean-room re-expression of
/root/reference/crawl4ai/adaptive_crawler.py:593-1228 — semantic-space
query mapping, k-NN coverage-gap analysis, gap-filling link selection,
coverage confidence, and held-out validation — with the two external
services the reference calls replaced by deterministic, re-derivable
stand-ins (the documented seams, like the media codec boundary):

- the embedding MODEL (reference: sentence-transformers / OpenAI via
  `_get_embeddings`, :612-621) → `hash_embed`: a hashing-trick bag-of-
  words embedding whose bucket/sign are derived from md5(token), so
  Spark and the DuckDB oracle produce bit-identical vectors (same
  md5-portability trick as operators/similarity's plane matrix);
- the LLM query-variation generator (`map_query_semantic_space`,
  :666-736) → `query_variations`: leave-one-term-out + term-pair
  variations of the query, deterministically ordered by md5 (the
  reference shuffles with `random` — same train/val split semantics,
  reproducible).

Everything else follows the reference math exactly: gap = 1 − best
cosine per query point (`find_coverage_gaps` :774-802), link score =
amplified mean improvement over uncovered gaps × (1 − overlap penalty)
(`select_links_for_expansion` :804-925), confidence = mean best-cosine
per query (`calculate_confidence` :927-946, the active implementation),
validation = mean (1 − min distance) on held-out queries
(`validate_coverage` :1056-1098).

Scale shape: embeddings are per-row Catalyst folds (no shuffle, no
UDF); the query set is tiny (≈ n_variations ≤ 20) and rides every
plan as a broadcast; the KB × queries / links × queries products are
broadcast joins aggregated map-side.  The KB itself never collects.
"""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_embed",
    "hash_embed_py",
    "query_variations",
    "split_train_val",
    "coverage_gaps",
    "coverage_shape",
    "embedding_confidence",
    "validation_score",
    "select_links",
    "kb_dedup_mask",
]


# ── deterministic hash embedding (the model seam) ────────────────────

def _adaptive_tokens(text) -> Column:
    """Lowercase word tokens of length > 2 — the adaptive tokenizer
    (`_tokenize`, adaptive_crawler.py:576-585 keeps len > 2)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(c), r"[^a-z0-9]+"),
        lambda w: (w != F.lit("")) & (F.length(w) > 2),
    )


def hash_embed(text, dim: int = 32) -> Column:
    """array<double> hashing-trick embedding, L2-normalized.

    Per token t: bucket = int(md5(t)[:8], 16) % dim, sign = +1 if
    md5(t)[8] in 0-7 else −1; vec[bucket] += sign; then v / ‖v‖
    (zero-token rows stay the zero vector).  md5 on BOTH engines:
    Spark `conv(substr(md5(t),1,8),16,10)`, DuckDB
    `('0x' || substr(md5(t),1,8))::BIGINT` — identical integers, so
    the oracle re-derives identical vectors with no model state.

    Pure per-row Catalyst fold: one md5 per token, then `dim` adds per
    token inside whole-stage codegen — no shuffle, no Python."""
    toks = _adaptive_tokens(text)
    md5 = lambda t: F.md5(t)  # noqa: E731 — one hash, two substrings
    hashed = F.transform(
        toks,
        lambda t: F.struct(
            (F.conv(F.substring(md5(t), 1, 8), 16, 10).cast("long") % dim)
            .cast("int").alias("b"),
            F.when(
                F.substring(md5(t), 9, 1).isin(*"01234567"), F.lit(1.0)
            ).otherwise(F.lit(-1.0)).alias("s"),
        ),
    )
    raw = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, e: F.transform(
            acc, lambda x, i: x + F.when(e["b"] == i, e["s"]).otherwise(F.lit(0.0))
        ),
    )
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm > 0, F.transform(raw, lambda x: x / norm)).otherwise(raw)


def hash_embed_py(text: str, dim: int = 32) -> list[float]:
    """Driver/simulator twin of `hash_embed` — bit-identical math."""
    vec = [0.0] * dim
    for t in re.split(r"[^a-z0-9]+", text.lower()):
        if len(t) <= 2:
            continue
        h = hashlib.md5(t.encode()).hexdigest()
        vec[int(h[:8], 16) % dim] += 1.0 if h[8] in "01234567" else -1.0
    n = math.sqrt(sum(x * x for x in vec))
    return [x / n for x in vec] if n > 0 else vec


def _dot(a, b) -> Column:
    """Dot product of two array<double> columns (vectors are already
    L2-normalized by hash_embed, so this IS cosine similarity)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


# ── query semantic space (the LLM seam) ──────────────────────────────

def query_variations(query: str, n: int = 10) -> list[str]:
    """Deterministic stand-in for the reference's LLM-generated query
    variations (`map_query_semantic_space`, :666-736: generate
    ~1.3·n variations exploring aspects of the query).  Variations are
    the leave-one-term-out reductions, then term pairs, then single
    terms — nearby points in embedding space that probe different
    aspects, which is all the downstream math needs.  Always excludes
    the query itself (the caller prepends it to the train split, like
    the reference)."""
    terms = [t for t in re.split(r"[^a-z0-9]+", query.lower()) if len(t) > 2]
    out: list[str] = []
    seen = {query.lower()}

    def _add(s: str) -> None:
        if s and s not in seen:
            seen.add(s)
            out.append(s)

    if len(terms) > 1:
        for i in range(len(terms)):          # leave-one-out
            _add(" ".join(terms[:i] + terms[i + 1:]))
        for i in range(len(terms)):          # ordered pairs
            for j in range(i + 1, len(terms)):
                _add(f"{terms[i]} {terms[j]}")
    for t in terms:                          # single aspects
        _add(t)
    n_total = int(n * 1.3)                   # reference's +30% for val
    return out[:n_total]


def split_train_val(query: str, variations: list[str]) -> tuple[list[str], list[str]]:
    """Reference split semantics (:716-729): the original query always
    trains; the variations are shuffled and the last max(2, 20%) are
    held out.  The shuffle is `random.shuffle` in the reference —
    replaced by an md5 sort (deterministic, still query-dependent)."""
    others = sorted(variations, key=lambda s: hashlib.md5(s.encode()).hexdigest())
    n_val = max(2, int(len(others) * 0.2)) if others else 0
    val = others[len(others) - n_val:]
    train = [query] + others[: len(others) - n_val]
    return train, val


def _query_df(spark, queries: list[str], dim: int) -> DataFrame:
    """(qid, qtext, qvec) — tiny (≤ ~20 rows); rides plans broadcast."""
    rows = [(i, q) for i, q in enumerate(queries)]
    return spark.createDataFrame(rows, "qid int, qtext string").withColumn(
        "qvec", hash_embed("qtext", dim)
    )


# ── coverage math ────────────────────────────────────────────────────

def coverage_gaps(
    kb: DataFrame, queries: DataFrame, vec_col: str = "vec", qvec_col: str = "qvec"
) -> DataFrame:
    """(qid, gap): gap = 1 − best cosine of each query point vs the KB
    (`find_coverage_gaps` :774-802; empty KB ⇒ gap 1.0 for all).

    Plan: KB × broadcast(queries) → per-qid max — the KB never
    shuffles; partial maxes combine map-side.  An EMPTY (non-None)
    KB needs no guard job: the left join below yields null best ⇒
    gap 1.0 — so no per-call take(1) Spark job fires."""
    if kb is None:
        return queries.select("qid", F.lit(1.0).alias("gap"))
    sims = kb.crossJoin(F.broadcast(queries)).select(
        "qid", _dot(F.col(vec_col), F.col(qvec_col)).alias("sim")
    )
    best = sims.groupBy("qid").agg(F.max("sim").alias("best"))
    # `best` is ≤ n_queries rows but post-agg (unknown stats) — hint
    # it broadcast so the reattach join never sorts either side
    return queries.select("qid").join(F.broadcast(best), "qid", "left").select(
        "qid", (F.lit(1.0) - F.coalesce("best", F.lit(0.0))).alias("gap")
    )


def embedding_confidence(
    kb: DataFrame, queries: DataFrame,
    vec_col: str = "vec", qvec_col: str = "qvec", tau: float | None = None,
) -> float:
    """Mean best-cosine per query (or hit-rate ≥ tau) — the reference's
    active `calculate_confidence` (:927-946).  One broadcast-join agg;
    driver traffic is the scalar (an empty KB aggregates to null ⇒
    0.0 — no emptiness-guard job)."""
    if kb is None:
        return 0.0
    best = (
        kb.crossJoin(F.broadcast(queries))
        .select("qid", _dot(F.col(vec_col), F.col(qvec_col)).alias("sim"))
        .groupBy("qid").agg(F.max("sim").alias("best"))
    )
    agg = (
        best.agg(F.avg(F.when(F.col("best") >= tau, 1.0).otherwise(0.0)).alias("s"))
        if tau is not None
        else best.agg(F.avg("best").alias("s"))
    )
    row = agg.collect()[0]
    return float(row["s"] or 0.0)


def validation_score(kb: DataFrame, val_queries: DataFrame,
                     vec_col: str = "vec", qvec_col: str = "qvec") -> float:
    """Held-out coverage: mean(1 − min cosine DISTANCE) over the
    validation queries (`validate_coverage` :1076-1094) — numerically
    the same as mean best-similarity, kept separate to mirror the
    reference's two code paths.  Empty KB ⇒ null agg ⇒ 0.0 with no
    guard job."""
    if kb is None:
        return 0.0
    best = (
        kb.crossJoin(F.broadcast(val_queries))
        .select("qid", _dot(F.col(vec_col), F.col(qvec_col)).alias("sim"))
        .groupBy("qid").agg(F.max("sim").alias("best"))
    )
    row = best.agg(F.avg(F.lit(1.0) - (F.lit(1.0) - F.col("best"))).alias("s")).collect()[0]
    return float(row["s"] or 0.0)


# ── link selection ───────────────────────────────────────────────────

def select_links(
    links: DataFrame,
    gaps_q: DataFrame,
    kb: DataFrame,
    coverage_radius: float = 0.2,
    overlap_threshold: float = 0.85,
    vec_col: str = "vec",
    link_vec_col: str = "lvec",
) -> DataFrame:
    """Score candidate links by how efficiently they fill coverage
    gaps (`select_links_for_expansion` :804-925).

    `links`: (href, link_text, seq, lvec); `gaps_q`: (qid, qvec, gap).
    Per link: over gaps with gap > coverage_radius, improvement =
    gap − (1 − cos(link, query)) where positive, amplified ×2;
    gap_reduction = Σ improvements / #gaps-needing-help; overlap
    penalty = 2·max(0, max-KB-similarity − overlap_threshold); score =
    gap_reduction · (1 − penalty).  Zero-text links (zero vectors)
    score 0 like the reference's skipped empty link texts.

    Plan: links × broadcast(gaps) agg + links × KB max-sim agg — two
    broadcast products, both combined map-side; returns (href,
    link_text, seq, emb_score)."""
    needing = gaps_q.filter(F.col("gap") > coverage_radius)
    n_needing = needing.count()  # ≤ n_variations: scalar-sized

    if n_needing == 0:
        scored = links.select(
            "href", "link_text", "seq", F.lit(0.0).alias("_gapred")
        )
    else:
        per_gap = links.crossJoin(F.broadcast(needing)).select(
            "href",
            F.col("gap"),
            (F.lit(1.0) - _dot(F.col(link_vec_col), F.col("qvec"))).alias("newd"),
        )
        improve = per_gap.select(
            "href",
            F.when(
                F.col("newd") < F.col("gap"),
                (F.col("gap") - F.col("newd")) * 2.0,  # reference's ×2 amplify
            ).otherwise(F.lit(0.0)).alias("imp"),
        )
        scored = (
            links.join(
                improve.groupBy("href").agg(
                    (F.sum("imp") / F.lit(float(n_needing))).alias("_gapred")
                ),
                "href", "left",
            )
            .select("href", "link_text", "seq",
                    F.coalesce("_gapred", F.lit(0.0)).alias("_gapred"))
        )

    if kb is not None:
        # empty KB: maxsim is empty, the left join yields null
        # _maxsim and the penalty when() falls through to 0
        maxsim = (
            links.crossJoin(F.broadcast(kb.select(vec_col)))
            .select("href", _dot(F.col(link_vec_col), F.col(vec_col)).alias("sim"))
            .groupBy("href").agg(F.max("sim").alias("_maxsim"))
        )
        scored = scored.join(maxsim, "href", "left").withColumn(
            "_pen",
            F.when(
                F.col("_maxsim") > overlap_threshold,
                (F.col("_maxsim") - overlap_threshold) * 2.0,
            ).otherwise(F.lit(0.0)),
        )
    else:
        scored = scored.withColumn("_pen", F.lit(0.0))

    return scored.select(
        "href", "link_text", "seq",
        (F.col("_gapred") * (F.lit(1.0) - F.col("_pen"))).alias("emb_score"),
    )


def coverage_shape(points: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Statistical coverage model of a point set — centroid + per-dim
    std + max radius (`compute_coverage_shape`, adaptive_crawler.py
    :737-758: high-dim alpha shapes are data-starved, so the reference
    stores center/std/radius instead; ported as a distributed agg so
    it also runs over corpus-sized KBs, not just query points).

    Returns one row per dimension: (i, center, std, radius) with the
    scalar radius repeated.  Plan: posexplode → per-dim agg (one
    shuffle keyed by dim index), then radius via a broadcast of the
    dim-sized stats back onto the points — ||x−c||² expanded as
    ||x||² − 2·x·c + ||c||² so the point side is one pass."""
    n = points.count()
    if n == 0:
        return points.sparkSession.createDataFrame(
            [], "i int, center double, std double, radius double"
        )
    per_dim = (
        points.select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(
            F.avg("x").alias("center"),
            F.coalesce(F.stddev_pop("x"), F.lit(0.0)).alias("std"),
        )
    )
    c_norm2 = per_dim.agg(
        F.sum(F.col("center") * F.col("center")).alias("c2")
    )
    dots = (
        # id BEFORE the explode: in one select with posexplode the
        # non-deterministic id is evaluated per OUTPUT row, splitting
        # every vector into singleton groups
        points.withColumn("_pid", F.monotonically_increasing_id())
        .select("_pid", F.posexplode(vec_col).alias("i", "x"))
        .join(F.broadcast(per_dim.select("i", "center")), "i")
        .groupBy("_pid")
        .agg(
            F.sum(F.col("x") * F.col("center")).alias("xc"),
            F.sum(F.col("x") * F.col("x")).alias("x2"),
        )
    )
    radius = (
        dots.crossJoin(F.broadcast(c_norm2))
        .select(
            F.sqrt(F.greatest(
                F.col("x2") - 2.0 * F.col("xc") + F.col("c2"), F.lit(0.0)
            )).alias("d")
        )
        .agg(F.max("d").alias("radius"))
    )
    return per_dim.crossJoin(F.broadcast(radius)).select(
        "i", "center", "std", "radius"
    )


def kb_dedup_mask(
    batch: DataFrame, kb: DataFrame,
    vec_col: str = "vec", threshold: float = 0.95,
) -> DataFrame:
    """Rows of `batch` NOT near-duplicating the existing KB: max
    cosine vs KB < threshold (`update_state` :1180-1205 dedups new
    documents at 0.95 before extending the KB).  Empty KB keeps all.
    Note: like the reference, the batch is compared against the PRIOR
    KB only, not within itself.  Empty KB: the left join coalesces
    to 0 < threshold and keeps every row — no guard job."""
    if kb is None:
        return batch
    kb_vecs = kb.select(F.col(vec_col).alias("_kbvec"))
    maxsim = (
        batch.crossJoin(F.broadcast(kb_vecs))
        .select("url", _dot(F.col(vec_col), F.col("_kbvec")).alias("sim"))
        .groupBy("url").agg(F.max("sim").alias("_maxsim"))
    )
    return (
        batch.join(maxsim, "url", "left")
        .filter(F.coalesce("_maxsim", F.lit(0.0)) < threshold)
        .drop("_maxsim")
    )
