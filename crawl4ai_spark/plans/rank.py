"""Exact, fully-parallel global ranking — the scalable replacement
for `Window.orderBy(...)` with no partition key.

A partition-less window funnels the whole input through ONE task; at
10^10-frontier scale that's the classic straggler.  This helper
computes the same exact global rank in three parallel steps:

    1. range-partition the input by the order key (repartitionByRange
       — Spark samples the key distribution, so any distribution is
       balanced, not just uniform ones);
    2. rank locally inside each range partition (keyed window);
    3. offset each partition's local ranks by the total row count of
       all lower ranges (a ≤P-row aggregate, broadcast back).

The result is bit-identical to `row_number().over(Window.orderBy(*
order))` whenever the order key is a total order (no ties) — which
every call site here guarantees by including a unique tiebreak column
(seq, or (batch_rank, link_pos)).  Range-boundary sampling
variability can move rows between partitions but can never change the
rank itself, so results are deterministic even though partition
shapes are not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_rank", "with_bucketed_rank"]


def with_global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds `rank_col` = exact 1-based global rank by `order`.

    `order` must be a total order over the rows (include a unique
    tiebreak); with ties the ranking is still a valid row_number but
    tie resolution follows range-partition placement.
    """
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    t = (
        df.repartitionByRange(num_partitions, *order)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(*order)
    t = t.withColumn("_lr", F.row_number().over(w_local))
    # per-range counts: ≤ num_partitions rows, so the cumulative-sum
    # window over them is trivially single-task by construction
    counts = t.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    return (
        t.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lr")).cast("long"))
        .drop("_pid", "_lr", "_off")
    )


def with_bucketed_rank(
    df: DataFrame,
    bucket: Column,
    order: list[Column],
    rank_col: str = "global_rank",
) -> DataFrame:
    """Exact global rank when the caller can supply `bucket`: a long
    column that is MONOTONE non-decreasing in the order key (every row
    of a lower bucket sorts before every row of a higher bucket).

    Same three-step shape as with_global_rank, but the range partition
    comes from arithmetic instead of sampling — one shuffle, no
    sampling job, no repartitionByRange.  The crawl engine derives the
    bucket from the bit structure of its arithmetic seq (high bits are
    (enqueue_iteration, parent_rank), which IS the FIFO order), so
    admission and capacity-trim ranks cost a keyed window plus a
    ≤#buckets-row aggregate.

    The bucket count must be modest (buckets ~ iterations × bands);
    the offset cum-sum window runs single-task over that tiny set by
    construction.
    """
    t = df.withColumn("_b", bucket.cast("long"))
    w_local = Window.partitionBy("_b").orderBy(*order)
    t = t.withColumn("_lr", F.row_number().over(w_local))
    counts = t.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0))
    ).select("_b", "_off")
    return (
        t.join(F.broadcast(offsets), "_b")
        .withColumn(rank_col, (F.col("_off") + F.col("_lr")).cast("long"))
        .drop("_b", "_lr", "_off")
    )
