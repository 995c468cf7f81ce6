"""Structured Streaming surface: incremental extraction equals batch
extraction; watermarked fetch metrics aggregate correctly; stateful
per-host politeness state evolves across micro-batches exactly like
the batch engine's host-state merge."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from crawl4ai_spark.extraction.udfs import extract_udf
from crawl4ai_spark.sources.synthetic_web import WebConfig, synthetic_pages_pdf
from crawl4ai_spark.streaming.continuous import (
    fetch_metrics_stream, host_politeness_stream, stream_extract,
)


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


def test_host_politeness_stream_state_across_batches(spark, tmp_path):
    """Three micro-batches of fetch outcomes; per-host (delay, fails)
    must carry across batches with the batch engine's exact backoff/
    decay semantics (base 1, backoff x2 cap 60, decay x0.5 floor 1):

      wave 1: h1 ok    -> (1.0, 0);   h2 429 -> (2.0, 1)
      wave 2: h1 429   -> (2.0, 1);   h2 429 -> (4.0, 2)
      wave 3: h2 ok    -> (2.0, 0)    (h1 absent: state untouched)
    """
    src = tmp_path / "outcomes"
    src.mkdir()
    waves = [
        [("h1", 200), ("h2", 429)],
        [("h1", 429), ("h2", 503), ("h2", 200)],
        [("h2", 200)],
    ]
    for i, rows in enumerate(waves):
        p = str(src / f"wave{i}")
        spark.createDataFrame(rows, "host string, status int").coalesce(
            1
        ).write.parquet(p)
        # FileStreamSource orders files by modification time; force it
        for root, _dirs, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema("host string, status int")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/wave*")
    )
    out = host_politeness_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("host_state_t")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "select host, delay, fails, n_ok, n_bad from host_state_t"
    ).collect()
    got = sorted((r.host, r.delay, r.fails, r.n_ok, r.n_bad) for r in rows)
    assert got == sorted([
        ("h1", 1.0, 0, 1, 0),
        ("h2", 2.0, 1, 0, 1),
        ("h1", 2.0, 1, 0, 1),
        ("h2", 4.0, 2, 1, 1),   # bad wins over ok within a batch
        ("h2", 2.0, 0, 1, 0),
    ])
