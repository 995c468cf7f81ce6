"""Structured Streaming surface: incremental extraction equals batch
extraction; watermarked fetch metrics aggregate correctly."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from crawl4ai_spark.extraction.udfs import extract_udf
from crawl4ai_spark.sources.synthetic_web import WebConfig, synthetic_pages_pdf
from crawl4ai_spark.streaming.continuous import fetch_metrics_stream, stream_extract


def test_stream_extract_matches_batch(spark, tmp_path):
    web = WebConfig(n_pages=40, n_hosts=3, seed=42)
    pdf = synthetic_pages_pdf(web)
    pdf = pdf[pdf.status_code == 200][["url", "html"]]
    pages_path = str(tmp_path / "pages")
    spark.createDataFrame(pdf).repartition(3).write.parquet(pages_path)

    docs_path = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    q = stream_extract(spark, pages_path, docs_path, ckpt, available_now=True)
    q.awaitTermination(180)

    streamed = spark.read.parquet(docs_path)
    batch = spark.createDataFrame(pdf).select(
        F.col("url").alias("doc_id"),
        extract_udf(F.col("url"), F.col("html")).alias("ex"),
    ).select("doc_id", F.col("ex.spans").alias("spans"))

    s = {r["doc_id"]: [(x["kind"], x["text"], x["media_ref"], x["offset"]) for x in r["spans"]]
         for r in streamed.select("doc_id", "spans").collect()}
    b = {r["doc_id"]: [(x["kind"], x["text"], x["media_ref"], x["offset"]) for x in r["spans"]]
         for r in batch.collect()}
    assert s == b  # streamed extraction ≡ batch extraction, span-for-span


def test_fetch_metrics_windowing(spark):
    t0 = datetime.datetime(2026, 1, 1, 10, 0, 0)

    def ts(sec):
        return t0 + datetime.timedelta(seconds=sec)

    rows = [
        ("h1", "success", ts(5)),
        ("h1", "success", ts(30)),
        ("h1", "retry", ts(65)),
        ("h2", "success", ts(10)),
        ("h2", "gave_up", ts(200)),
    ]
    df = spark.createDataFrame(rows, "host string, outcome string, ts timestamp")
    out = {(r["window_start"].minute, r["host"]): (r["n_fetches"], r["n_ok"], r["n_backoff"])
           for r in fetch_metrics_stream(df).collect()}
    assert out[(0, "h1")] == (2, 2, 0)
    assert out[(1, "h1")] == (1, 0, 1)
    assert out[(3, "h2")] == (1, 0, 1)
