"""Sequence packing: assign documents to fixed-length training
sequences — the step between a curated corpus and a tokenizer's input.

GPT-style packing concatenates documents into one token stream and
cuts it every `seq_len` tokens (documents may straddle a boundary).
A single global stream cannot scale, so the stream is SHARDED: each
doc hashes to one of `n_buckets` independent streams, and packing is
exact within its bucket.  This is how production packers work —
packing quality needs locality, not global order — and it makes the
assignment fully deterministic: same rows → same sequences at any
parallelism, resumable and auditable like the sampling operators.

Shapes: one window per bucket (cumsum in hash order).  Buckets are
the parallelism unit: n_buckets ≥ cluster cores keeps every partition
busy; each bucket's stream is O(corpus/n_buckets) so no partition
outgrows memory at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "pack_sequences", "pack_summary"]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_bucket(key, n_buckets: int) -> Column:
    """Deterministic bucket from the SECOND 8 hex chars of md5(key) —
    independent of `hash_u01` (first 8), so bucket and within-bucket
    order don't correlate.  md5-derived to stay oracle-reproducible."""
    h8 = F.substring(F.md5(_col(key).cast("string")), 9, 8)
    return F.pmod(F.conv(h8, 16, 10).cast("long"), F.lit(n_buckets)).cast("int")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    seq_len: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Per doc: (id, bucket, start_offset, seq_id) where start_offset
    is the doc's position in its bucket's concatenated token stream and
    seq_id = the global id of the fixed-length sequence the doc STARTS
    in (bucket * ceil-capacity + start_offset // seq_len).  Docs may
    straddle sequence boundaries, as in standard packed pretraining."""
    from crawl4ai_spark.operators.sampling import hash_u01

    b = hash_bucket(id_col, n_buckets)
    u = hash_u01(id_col)
    base = df.select(
        _col(id_col), _col(token_col).alias("_w"), b.alias("bucket"), u.alias("_u01")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("_u01", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("_w").over(w)
    start = (cum - F.col("_w")).alias("start_offset")
    return base.select(
        id_col,
        "bucket",
        start,
        (F.col("bucket").cast("long") * (1 << 32)
         + F.floor((cum - F.col("_w")) / seq_len)).alias("seq_id"),
        F.col("_w").alias("n_tokens"),
    )


def pack_summary(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per sequence: docs that start in it, their token mass, and the
    fill ratio of the leading seq_len window (>1 = docs spill into the
    next sequence, standard for packed streams)."""
    return packed.groupBy("seq_id").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum("n_tokens").alias("tokens_started"),
        F.round(F.sum("n_tokens") / F.lit(float(seq_len)), 6).alias("fill_ratio"),
    )
