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
    mode: str = "join",
) -> DataFrame:
    """Per-document benchmark-overlap audit.

    Returns `df` plus:
      - `bench_gram_hits`: distinct n-grams of this doc that appear in
        the eval set (per-doc grams are already distinct via
        `shingles`, so this is |grams(doc) ∩ grams(bench)|).
      - `contaminated`: bench_gram_hits >= min_overlap.

    mode="join" (default): explode corpus grams, probe the broadcast
    eval gram table, one keyed count — the general shape; works for
    eval sets of any size (`broadcast_bench=False` falls back to a
    plain equi-join when the eval set is too large to broadcast).

    mode="map": fold the eval grams into ONE broadcast array and count
    per row with `array_intersect` — zero explode, zero shuffle, zero
    aggregation, so it is fully STATELESS and runs unchanged over a
    Structured Stream (stream-static join, append mode).  Identical
    counts (both sides are distinct gram sets); prefer it whenever the
    eval gram set fits comfortably in an executor task (typical: eval
    sets are MBs).
    """
    probe = bench_ngrams(bench, bench_text_col, n)
    if mode == "map":
        probe_arr = probe.agg(F.collect_set("gram").alias("_bench_grams"))
        return (
            df.crossJoin(F.broadcast(probe_arr))
            .withColumn(
                "bench_gram_hits",
                F.size(
                    F.array_intersect(
                        shingles(text_col, n), F.col("_bench_grams")
                    )
                ).cast("long"),
            )
            .drop("_bench_grams")
            .withColumn(
                "contaminated", F.col("bench_gram_hits") >= F.lit(min_overlap)
            )
        )
    grams = df.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("gram"))
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
