"""Continuous extraction + streaming crawl metrics.

`stream_extract`: readStream over an arriving pages table (the
production shape: fetchers append parquet/Iceberg files; extraction
runs as an always-on incremental job) → the same fused extract UDF as
the batch engine → append-mode docs sink.  Exactly-once comes from
the sink checkpoint; the extract UDF is pure, so replays are safe.

`stream_fetch_metrics`: watermarked tumbling-window counts over the
crawl log — the streaming analogue of the reference's dispatcher
queue statistics (async_dispatcher.py:509-521), with late-arrival
handling the reference doesn't have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.extraction.udfs import extract_udf


def stream_extract(
    spark: SparkSession,
    pages_path: str,
    docs_path: str,
    checkpoint_path: str,
    *,
    available_now: bool = True,
):
    """Incrementally extract every page file that lands in
    `pages_path` (schema: url string, html string, …) into the
    interleaved-docs table at `docs_path`.  Returns the query handle.
    """
    pages = (
        spark.readStream.schema("url string, html string")
        .option("maxFilesPerTrigger", "8")
        .parquet(pages_path)
    )
    docs = pages.select(
        F.col("url").alias("doc_id"),
        extract_udf(F.col("url"), F.col("html")).alias("ex"),
    ).select(
        "doc_id",
        F.col("ex.spans").alias("spans"),
        F.col("ex.raw_markdown").alias("raw_markdown"),
        F.col("ex.metadata").alias("metadata"),
    )
    writer = (
        docs.writeStream.format("parquet")
        .option("path", docs_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def fetch_metrics_stream(events: DataFrame, *, window: str = "1 minute",
                         watermark: str = "2 minutes") -> DataFrame:
    """events(host string, outcome string, ts timestamp) →
    per-(window, host) fetch counts with late-data watermark.
    Works on both a streaming and a batch DataFrame (same plan)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "host")
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(F.when(F.col("outcome") == "success", 1).otherwise(0)).alias("n_ok"),
            F.sum(F.when(F.col("outcome").isin("retry", "gave_up"), 1).otherwise(0)).alias("n_backoff"),
        )
        .select(F.col("w.start").alias("window_start"), "host",
                "n_fetches", "n_ok", "n_backoff")
    )
