"""Classifier-based quality/language filtering: distributed
multinomial Naive Bayes (fit + predict), pure Catalyst.

The third pillar of LLM training-data curation next to rule filters
and dedup: GPT-3 filtered CommonCrawl with a quality classifier and
LLaMA with a fastText-style one.  A multinomial NB over word counts is
the distributed-exact member of that family: the fit is two keyed
aggregations (class stats + per-class token counts), the predict is
one token-keyed join + one (doc, class) sum — every step an exact
DataFrame computation with no iterative optimizer, so the whole
operator is oracle-checkable in SQL and deterministic at any
parallelism.

Scale shape: token_stats is keyed by token (the only corpus-sized
shuffle at predict time); class_stats is O(#classes) rows and rides
a broadcast; model "collects" are two scalars (total docs, vocab
size) — model-sized, never corpus-sized.

Laplace smoothing with parameter alpha:
    score(d, c) = log P(c)
                + m_d * (log alpha - log(tokens_c + alpha*V))
                + sum_{t in d, t in c} n_t * (log(cnt_tc + alpha) - log alpha)
where m_d counts the doc's IN-VOCAB tokens (out-of-vocabulary tokens
are ignored — the standard choice, and the one that keeps train-time
and test-time vocabularies consistent).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text

__all__ = ["NBModel", "token_counts", "nb_fit", "nb_predict"]


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, token, n): per-document word counts over normalized text
    (same normalize+split as the shingle/dedup pipeline)."""
    words = F.filter(
        F.split(normalize_text(text_col), " "), lambda w: w != F.lit("")
    )
    return (
        df.select(F.col(id_col), F.explode(words).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("n"))
    )


@dataclass
class NBModel:
    class_stats: DataFrame  # (label, log_prior, log_denom) — O(#classes)
    token_stats: DataFrame  # (label, token, loglik) — loglik = log(cnt+a)-log(a)
    vocab: DataFrame        # (token,) distinct training vocabulary
    alpha: float


def nb_fit(
    train: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> NBModel:
    """Fit multinomial NB.  Docs whose normalized text is empty carry
    no token rows and drop out of both the priors and the likelihoods
    (they carry no signal either way)."""
    tc = token_counts(train, text_col, id_col).join(
        train.select(F.col(id_col), F.col(label_col).alias("label")), id_col
    )
    cls = tc.groupBy("label").agg(
        F.countDistinct(id_col).alias("docs_c"), F.sum("n").alias("tokens_c")
    )
    cls_rows = cls.collect()  # O(#classes) — model-sized
    total_docs = float(sum(r.docs_c for r in cls_rows))
    vocab = tc.select("token").distinct()
    v = float(vocab.count())
    spark = train.sparkSession
    class_stats = spark.createDataFrame(cls_rows).select(
        "label",
        F.log(F.col("docs_c") / F.lit(total_docs)).alias("log_prior"),
        F.log(F.col("tokens_c") + F.lit(v)).alias("log_denom"),
    )
    token_stats = (
        tc.groupBy("label", "token")
        .agg(F.sum("n").alias("cnt"))
        .select(
            "label",
            "token",
            (
                F.log(F.col("cnt") + F.lit(alpha)) - F.lit(math.log(alpha))
            ).alias("loglik"),
        )
    )
    return NBModel(class_stats, token_stats, vocab, alpha)


def nb_predict(
    df: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, label, score) — the argmax class per document and its
    joint log-likelihood.  Ties break to the lexically smallest label
    (deterministic).  Documents with no in-vocabulary token are
    omitted (no evidence, no prediction)."""
    dt = token_counts(df, text_col, id_col).join(model.vocab, "token", "left_semi")
    md = dt.groupBy(id_col).agg(F.sum("n").alias("m"))
    hit = (
        dt.join(model.token_stats, "token")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("n") * F.col("loglik")).alias("hit_sum"))
    )
    scores = (
        md.crossJoin(F.broadcast(model.class_stats))
        .join(hit, [id_col, "label"], "left")
        .select(
            F.col(id_col),
            "label",
            (
                F.col("log_prior")
                + F.col("m")
                * (F.lit(math.log(model.alpha)) - F.col("log_denom"))
                + F.coalesce(F.col("hit_sum"), F.lit(0.0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
