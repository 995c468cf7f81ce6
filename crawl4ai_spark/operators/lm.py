"""n-gram language-model scoring for corpus curation.

Two published data-selection primitives a 100 TB training-data
pipeline runs right after dedup/rule filters:

1. CCNet-style perplexity filtering (Wenzek et al. 2020, "CCNet:
   Extracting High Quality Monolingual Datasets from Web Crawl
   Data"): fit a small smoothed n-gram LM on a clean reference
   slice, score every document by (log-)perplexity under it.  Low
   perplexity ≈ fluent / in-domain; the score feeds a quantile cut.
   Here: an add-k-smoothed bigram model — the model is two dim
   tables (bigram→logp, context→unseen-logp) whose size is bounded
   by the reference slice's vocabulary, NOT the corpus, so at 100 TB
   they broadcast while the corpus side streams map-side.

2. DSIR hashed n-gram importance weights (Xie et al. 2023, "Data
   Selection for Language Models via Importance Resampling"):
   hash every unigram+bigram into B buckets, estimate bucket
   distributions p (target slice) and q (raw corpus), and weight
   each document by Σ_features log(p_b/q_b).  The whole model is a
   B-row dim table (B≈10k even for production runs) — broadcast —
   and scoring is one explode + one map-side-combinable agg.

Everything is pure Catalyst (no Python in the hot path).  Hashing
uses md5→int so the DuckDB correctness oracle reproduces bucket
assignment bit-for-bit (same trick as operators/dedup.py minhash);
swap to xxhash64 via `hash_fn` when oracle portability isn't needed.

Reference behavior parity note: the reference repo (crawl4ai) has no
LM scoring — this is part of the beyond-reference training-data
surface (SURVEY §2 addendum), same as dedup/ANN/quality.

Scale shape:
  fit        — explode(bigrams) → groupBy(bigram) count: one shuffle
               on the bigram key, partial aggs map-side; context and
               vocab are rollups of that table.
  score      — explode(bigrams) → broadcast-join the model dims →
               groupBy(doc_id): one shuffle on doc_id (and AQE can
               fold it into the scan when the corpus is pre-bucketed
               by doc_id).  No driver state, no windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.operators.dedup import normalize_text

__all__ = [
    "word_array",
    "bigram_array",
    "fit_bigram_lm",
    "score_log_perplexity",
    "dsir_bucket_weights",
    "dsir_log_weights",
    "ccnet_buckets",
]


def word_array(text) -> Column:
    """Whitespace tokens of normalized text (lower, collapse \\s+)."""
    return F.filter(F.split(normalize_text(text), " "), lambda w: w != F.lit(""))


def bigram_array(words: Column) -> Column:
    """Adjacent word pairs as "w1 w2" strings; [] when <2 words."""
    n = F.size(words)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)),
        )
    )


def _bigrams_long(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # _rebalance: the explode multiplies per-row work by the token
    # count — an under-split scan (single parquet row group) would
    # pipeline the whole corpus onto one task (same hazard as the
    # minhash shingle explode; see BENCH/SCALING_NOTES.md)
    from crawl4ai_spark.operators.dedup import _rebalance

    return _rebalance(df, id_col).select(
        F.col(id_col),
        F.explode(bigram_array(word_array(text_col))).alias("bigram"),
    )


def fit_bigram_lm(
    ref: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: float = 0.1
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fit an add-k bigram LM on the reference slice.

    Returns (model, ctx, vocab):
      model — (bigram, logp):        ln((c + k) / (n_ctx + k·V))
      ctx   — (w1, logp_unseen):     ln(k / (n_ctx + k·V)) for a seen
                                     context with an unseen next word
      vocab — 1 row (v_size, oov_logp=-ln V) for unseen contexts
              (c=0, n_ctx=0 ⇒ ln(k/(k·V)) = -ln V)

    All three are dims bounded by the reference vocabulary; the big
    corpus never flows through here.  One wide shuffle (bigram
    counts); ctx/vocab are rollups of the same exploded pass.
    """
    big = _bigrams_long(ref, text_col, id_col)
    counts = big.groupBy("bigram").agg(F.count("*").alias("c"))
    counts = counts.withColumn("w1", F.substring_index("bigram", " ", 1))
    ctx_n = counts.groupBy("w1").agg(F.sum("c").alias("n_ctx"))
    # V = distinct tokens in the reference slice (unigrams, all positions)
    vocab = (
        ref.select(F.explode(word_array(text_col)).alias("tok"))
        .agg(F.countDistinct("tok").alias("v_size"))
        .select(
            "v_size", (-F.log(F.col("v_size").cast("double"))).alias("oov_logp")
        )
    )
    denom = F.col("n_ctx") + F.lit(k) * F.col("v_size")
    model = (
        counts.join(ctx_n, "w1")
        .crossJoin(F.broadcast(vocab.select("v_size")))
        .select("bigram", F.log((F.col("c") + F.lit(k)) / denom).alias("logp"))
    )
    ctx = (
        ctx_n.crossJoin(F.broadcast(vocab.select("v_size")))
        .select("w1", F.log(F.lit(k) / denom).alias("logp_unseen"))
    )
    return model, ctx, vocab


def score_log_perplexity(
    df: DataFrame,
    model: DataFrame,
    ctx: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document log-perplexity under the fitted bigram LM.

    Output: (id_col, n_bigrams, log_ppl = -mean bigram logp).  Docs
    with <2 words are absent (no bigrams to score).  Reported in log
    space: exp() is a monotone decoration that only loses cross-
    engine float reproducibility.

    Plan shape: explode → TWO broadcast left joins (model, ctx) →
    groupBy(doc_id).  The model dims broadcast because they are
    vocabulary-bounded; the corpus-side explode is linear and
    map-side-combines into the doc_id agg.
    """
    big = _bigrams_long(df, text_col, id_col)
    scored = (
        big.withColumn("w1", F.substring_index("bigram", " ", 1))
        .join(F.broadcast(model), "bigram", "left")
        .join(F.broadcast(ctx), "w1", "left")
        .crossJoin(F.broadcast(vocab.select("oov_logp")))
        .select(
            id_col,
            F.coalesce("logp", "logp_unseen", "oov_logp").alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        (-F.avg("lp")).alias("log_ppl"),
    )


# ── DSIR hashed n-gram importance weights ────────────────────────────


def _features_long(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Unigram + bigram feature stream per document (with repeats —
    DSIR weights count occurrences, not distinct features)."""
    from crawl4ai_spark.operators.dedup import _rebalance

    words = word_array(text_col)
    feats = F.concat(words, bigram_array(words))
    return _rebalance(df, id_col).select(F.col(id_col), F.explode(feats).alias("feat"))


def _bucket(feat: Column, buckets: int) -> Column:
    # md5→int so DuckDB reproduces the bucket id exactly
    # (('0x' || substr(md5(f),1,8))::BIGINT % B on the oracle side).
    return F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("long") % buckets


def dsir_bucket_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    k: float = 1.0,
) -> DataFrame:
    """The DSIR model: per hash bucket b, log(p_b / q_b) where p is
    the add-k-smoothed bucket distribution of the TARGET slice and q
    of the RAW corpus.  Output: (bucket, log_ratio) — exactly
    `buckets` rows, a broadcastable dim at any corpus size."""
    spark = raw.sparkSession

    def _bucket_counts(df: DataFrame, name: str) -> DataFrame:
        return (
            _features_long(df, text_col, id_col)
            .select(_bucket(F.col("feat"), buckets).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias(name))
        )

    tc = _bucket_counts(target, "c_t")
    rc = _bucket_counts(raw, "c_r")
    # scalar totals ride the plan as 1-row broadcast dims (no collect)
    tt = tc.agg(F.sum("c_t").alias("n_t"))
    rt = rc.agg(F.sum("c_r").alias("n_r"))
    dim = (
        spark.range(buckets)
        .select(F.col("id").alias("bucket"))
        .join(tc, "bucket", "left")
        .join(rc, "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
    )
    kB = F.lit(float(k) * buckets)
    p = (F.coalesce("c_t", F.lit(0)) + F.lit(k)) / (F.col("n_t") + kB)
    q = (F.coalesce("c_r", F.lit(0)) + F.lit(k)) / (F.col("n_r") + kB)
    return dim.select("bucket", (F.log(p) - F.log(q)).alias("log_ratio"))


def dsir_log_weights(
    raw: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """Per-document DSIR log importance weight: Σ over the doc's
    feature occurrences of log(p_b/q_b).  Output: (id_col, n_feats,
    log_weight).  One explode + one broadcast join + one doc_id agg."""
    feats = _features_long(raw, text_col, id_col).select(
        id_col, _bucket(F.col("feat"), buckets).alias("bucket")
    )
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("log_ratio").alias("log_weight"),
        )
    )


def ccnet_buckets(
    scored: DataFrame,
    lang_col: str = "lang",
    ppl_col: str = "log_ppl",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
    round_to: int = 6,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.4): per
    language, cut the perplexity distribution at the given quantiles
    and label each document's tercile — "head" is the most-fluent
    slice that trains first-pass models, "tail" gets dropped or
    down-sampled.

    Scale shape: the cutoffs are a per-language AGG (2 numbers per
    language — a dim of a few hundred rows at web scale), broadcast
    back onto the scored corpus; assignment is a map-side comparison.
    No window, no per-language sort — the corpus is never ordered.
    Exact interpolated percentile here; at 100 TB swap in
    percentile_approx (same plan shape, sketch-mergeable) exactly as
    CCNet computes cutoffs on a sample.

    Values compare after rounding to `round_to` so the bucket label is
    reproducible across engines/precisions at the cut boundary.
    """
    c1, c2 = cuts
    cutd = scored.groupBy(lang_col).agg(
        F.round(F.percentile(ppl_col, F.lit(c1)), round_to).alias("_cut1"),
        F.round(F.percentile(ppl_col, F.lit(c2)), round_to).alias("_cut2"),
    )
    r = F.round(F.col(ppl_col), round_to)
    return (
        scored.join(F.broadcast(cutd), lang_col)
        .withColumn(
            "bucket",
            F.when(r <= F.col("_cut1"), labels[0])
            .when(r <= F.col("_cut2"), labels[1])
            .otherwise(labels[2]),
        )
        .drop("_cut1", "_cut2")
    )
