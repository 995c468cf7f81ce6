"""BM25 relevance scoring — fully native (no UDF).

Clean-room re-expression of the reference's BM25 uses: seeder corpus
scoring (async_url_seeder.py:1380-1424, BM25Okapi over head texts,
min-max normalized), ContentRelevanceFilter (filters.py:501-573), and
the BM25 content filter's chunk scoring (content_filter_strategy.py:
381-530).  The reference calls a Python BM25 library over an
in-memory corpus; here corpus statistics (document frequency, average
doc length) are DataFrame aggregates, so the same scoring runs over a
corpus of any size with two small shuffles (df-terms, then join).

BM25Okapi (the library the reference uses):
  idf(t)  = ln((N - df + 0.5)/(df + 0.5) + 1)
  score(d)= Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["tokenize", "bm25_scores", "bm25_minmax"]


def tokenize(text) -> Column:
    """Lowercase word tokens — the reference tokenizes with a simple
    split for BM25 (async_url_seeder.py:1390)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda w: w != F.lit(""))


def bm25_scores(
    docs: DataFrame, query: str, text_col: str = "text", id_col: str = "doc_id",
    k1: float = 1.5, b: float = 0.75,
) -> DataFrame:
    """Adds `bm25` per document for the given query string."""
    q_terms = [t for t in set(tokenize_py(query)) if t]
    toks = docs.select(F.col(id_col), F.explode(tokenize(text_col)).alias("term"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    n_docs = docs.count()
    avgdl_row = dl.agg(F.avg("dl").alias("a")).collect()[0]["a"] or 1.0

    tf = (
        toks.filter(F.col("term").isin(q_terms))
        .groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .withColumn(
            "part",
            idf * (F.col("tf") * (k1 + 1)) /
            (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl_row)))),
        )
        .groupBy(id_col).agg(F.sum("part").alias("bm25"))
    )
    return docs.join(scored, id_col, "left").withColumn(
        "bm25", F.coalesce("bm25", F.lit(0.0))
    )


def bm25_minmax(scored: DataFrame, score_col: str = "bm25") -> DataFrame:
    """Min-max normalize to [0,1] (seeder semantics,
    async_url_seeder.py:1414-1424); constant corpus → 0.5."""
    row = scored.agg(F.min(score_col).alias("lo"), F.max(score_col).alias("hi")).collect()[0]
    lo, hi = float(row["lo"] or 0.0), float(row["hi"] or 0.0)
    if hi - lo < 1e-12:
        return scored.withColumn(score_col + "_norm", F.lit(0.5))
    return scored.withColumn(
        score_col + "_norm", (F.col(score_col) - lo) / (hi - lo)
    )


def tokenize_py(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
