"""Benchmark decontamination: flag corpus documents that overlap an
evaluation set by word n-grams.

The standard training-data hygiene step (popularized by the GPT-3 and
Gopher dataset reports): any document sharing >= `min_overlap` word
n-grams with a benchmark/eval set is flagged so it can be dropped
before training, preventing test-set leakage.

Scale shape: the eval set is tiny next to the corpus (MBs vs 100 TB),
so its distinct n-gram set is BROADCAST and the corpus side streams
map-side through the hash join — no corpus shuffle for the probe, one
keyed aggregation for the per-doc hit count.  The corpus n-gram
explode is the same `shingles` expression the minhash cascade uses
(pure Catalyst, no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles

__all__ = ["bench_ngrams", "decontaminate"]


def bench_ngrams(bench: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Distinct word n-grams of the eval set — the probe side.
    Deduplicated before broadcast so the hashmap is minimal."""
    return bench.select(
        F.explode(shingles(text_col, n)).alias("gram")
    ).distinct()


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 5,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document benchmark-overlap audit.

    Returns `df` plus:
      - `bench_gram_hits`: distinct n-grams of this doc that appear in
        the eval set (per-doc grams are already distinct via
        `shingles`, so this is |grams(doc) ∩ grams(bench)|).
      - `contaminated`: bench_gram_hits >= min_overlap.

    `broadcast_bench=False` falls back to a plain equi-join for the
    (rare) case of an eval set too large to broadcast; the join key is
    still the gram string so the counts are exact either way.
    """
    grams = df.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("gram"))
    probe = bench_ngrams(bench, bench_text_col, n)
    if broadcast_bench:
        probe = F.broadcast(probe)
    hits = (
        grams.join(probe, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("bench_gram_hits"))
    )
    return (
        df.join(hits, id_col, "left")
        .withColumn(
            "bench_gram_hits", F.coalesce(F.col("bench_gram_hits"), F.lit(0))
        )
        .withColumn(
            "contaminated", F.col("bench_gram_hits") >= F.lit(min_overlap)
        )
    )
