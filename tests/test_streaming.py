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


def _waves(spark, src, waves, schema):
    for i, rows in enumerate(waves):
        p = str(src / f"wave{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
        for root, _dirs, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (1_000_000 + i, 1_000_000 + i))


def test_stream_dedup_exact_within_watermark(spark, tmp_path):
    """Re-arrivals of the same content within the watermark horizon are
    dropped across micro-batches; distinct content always passes."""
    from crawl4ai_spark.streaming.continuous import stream_dedup_exact

    t0 = datetime.datetime(2026, 1, 1, 10, 0, 0)

    def ts(sec):
        return t0 + datetime.timedelta(seconds=sec)

    src = tmp_path / "docs"
    src.mkdir()
    _waves(spark, src, [
        [("a", "hello world", ts(0)), ("b", "other text", ts(1))],
        [("c", "hello world", ts(30)),        # dup of a, within horizon
         ("d", "third text", ts(31))],
        [("e", "other text", ts(60))],        # dup of b, within horizon
    ], "doc_id string, text string, ts timestamp")

    stream = (
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/wave*")
    )
    out = stream_dedup_exact(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("dedup_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = sorted(r.doc_id for r in spark.sql("select doc_id from dedup_t").collect())
    assert got == ["a", "b", "d"]


def test_first_seen_stream_across_batches(spark, tmp_path):
    """Each content hash is emitted exactly once across micro-batches;
    within-batch ties break by smallest doc_id."""
    from crawl4ai_spark.streaming.continuous import first_seen_stream

    src = tmp_path / "hashes"
    src.mkdir()
    _waves(spark, src, [
        [(11, "b"), (11, "a"), (22, "c")],    # tie on 11 -> "a" wins
        [(11, "d"), (33, "e")],               # 11 already seen
        [(22, "f"), (33, "g"), (44, "h")],    # 22, 33 seen; 44 new
    ], "content_hash long, doc_id string")

    stream = (
        spark.readStream.schema("content_hash long, doc_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/wave*")
    )
    out = first_seen_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("first_seen_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.content_hash, r.doc_id)
        for r in spark.sql("select * from first_seen_t").collect()
    )
    assert got == [(11, "a"), (22, "c"), (33, "e"), (44, "h")]


def test_stream_quality_signals_stateless(spark, tmp_path):
    """The curation signals (Gopher repetition/quality, C4 gates, text
    quality) are pure Catalyst projections, so they must run unchanged
    over a stream — no state store, no watermark, append mode."""
    from crawl4ai_spark.operators import repetition as R
    from crawl4ai_spark.operators import text as T

    rows = [
        ("a", "the cat sat on the mat. the cat sat on the mat."),
        ("b", "- bullet\n- bullet\nplain line here."),
    ]

    def signals(df):
        return df.select(
            "doc_id",
            R.gopher_repetition("text")["dup_line_frac"].alias("dup_line_frac"),
            R.gopher_quality_flags("text")["passes"].alias("gopher_passes"),
            R.c4_doc_flags("text")["keep_doc"].alias("c4_keep"),
            F.round(T.quality_score("text"), 6).alias("quality"),
        )

    src = tmp_path / "qdocs"
    src.mkdir()
    _waves(spark, src, [[rows[0]], [rows[1]]], "doc_id string, text string")

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/wave*")
    )
    q = (
        signals(stream).writeStream.format("memory").queryName("quality_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {r.doc_id: r for r in spark.sql("select * from quality_t").collect()}
    assert set(got) == {"a", "b"}
    # batch ≡ stream on the same rows
    batch = {
        r.doc_id: r
        for r in signals(
            spark.createDataFrame(rows, "doc_id string, text string")
        ).collect()
    }
    for k in got:
        assert got[k] == batch[k]


def test_stream_dedup_paragraphs(spark, tmp_path):
    """First arrival of each normalized paragraph survives; later
    re-arrivals (same or other docs) are dropped within the horizon."""
    from crawl4ai_spark.streaming.continuous import stream_dedup_paragraphs

    t0 = datetime.datetime(2026, 1, 1, 10, 0, 0)

    def ts(sec):
        return t0 + datetime.timedelta(seconds=sec)

    src = tmp_path / "pdocs"
    src.mkdir()
    _waves(spark, src, [
        [("a", "alpha para.\nshared boilerplate.", ts(0))],
        [("b", "SHARED   boilerplate.\nbeta para.", ts(30))],   # normalized dup
        [("c", "gamma para.\nalpha para.", ts(60))],             # dup of a's first
    ], "doc_id string, text string, ts timestamp")

    stream = (
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/wave*")
    )
    out = stream_dedup_paragraphs(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("para_dedup_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.doc_id, r.para)
        for r in spark.sql("select doc_id, para from para_dedup_t").collect()
    )
    assert got == [
        ("a", "alpha para."),
        ("a", "shared boilerplate."),
        ("b", "beta para."),
        ("c", "gamma para."),
    ]
