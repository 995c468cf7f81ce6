"""Chunking operators (E10) — document → ordered chunk rows.

Clean-room re-expression of the reference's chunking strategies
(/root/reference/crawl4ai/chunking_strategy.py:28-60 — Identity and
RegexChunking on '\\n\\n'; utils.py:75-159 — token-threshold sliding
window with overlap; utils.py:161-223 — chunk merge).  All native:
split/sequence/slice/posexplode, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["regex_chunks", "window_chunks", "explode_chunks", "merge_small_chunks"]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def regex_chunks(text, pattern: str = r"\n\n") -> Column:
    """RegexChunking: split on a pattern, drop empty chunks
    (chunking_strategy.py:44-60)."""
    return F.filter(F.split(_col(text), pattern), lambda c: F.trim(c) != F.lit(""))


def window_chunks(text, window_tokens: int = 100, overlap: int = 20) -> Column:
    """Sliding-window chunker over whitespace tokens with overlap
    (utils.py:75-159 semantics: stride = window - overlap, last
    partial window kept)."""
    assert 0 <= overlap < window_tokens
    words = F.filter(F.split(F.trim(_col(text)), r"\s+"), lambda w: w != F.lit(""))
    stride = window_tokens - overlap
    n = F.size(words)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)).cast("int")
    )
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda j: F.concat_ws(" ", F.slice(words, j * stride + 1, window_tokens)),
    )


def explode_chunks(df: DataFrame, chunks: Column, id_col: str = "doc_id") -> DataFrame:
    """(id, chunk_idx, chunk) rows in document order."""
    return df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk"))


def merge_small_chunks(df: DataFrame, min_tokens: int = 20,
                       id_col: str = "doc_id") -> DataFrame:
    """Merge each under-sized chunk into its predecessor
    (utils.py:161-223 semantics, expressed as a window: chunks open a
    new group whenever the previous chunk met the threshold)."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("chunk_idx")
    n_tok = F.size(F.filter(F.split(F.trim("chunk"), r"\s+"), lambda x: x != F.lit("")))
    with_flag = df.withColumn("n_tok", n_tok).withColumn(
        "prev_big", F.lag(F.col("n_tok") >= min_tokens, 1, True).over(w)
    )
    grouped = with_flag.withColumn(
        "grp", F.sum(F.when(F.col("prev_big"), 1).otherwise(0)).over(w)
    )
    # collect as (idx, chunk) structs and sort inside the group —
    # collect_list order is not otherwise deterministic after a shuffle
    merged = grouped.groupBy(id_col, "grp").agg(
        F.min("chunk_idx").alias("chunk_idx"),
        F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))).alias("parts"),
    )
    return merged.select(
        id_col, "chunk_idx",
        F.concat_ws(" ", F.transform("parts", lambda p: p["chunk"])).alias("chunk"),
    )
