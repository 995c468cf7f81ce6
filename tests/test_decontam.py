"""Benchmark decontamination (eval-set n-gram overlap)."""

from __future__ import annotations

from crawl4ai_spark.operators.decontam import decontaminate


def _run(spark, docs, bench, **kw):
    ddf = spark.createDataFrame(docs, "doc_id int, text string")
    bdf = spark.createDataFrame(bench, "doc_id int, text string")
    out = decontaminate(ddf, bdf, **kw)
    return {r.doc_id: (r.bench_gram_hits, r.contaminated) for r in out.collect()}


def test_overlap_counts_and_flag(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely unrelated text with no shared phrases at all"),
    ]
    bench = [(100, "quick brown fox jumps over")]  # exactly one 5-gram
    r = _run(spark, docs, bench, n=5, min_overlap=1)
    assert r[1] == (1, True)
    assert r[2] == (0, False)


def test_min_overlap_threshold(spark):
    docs = [(1, "a b c d e f"), (2, "a b c d e x")]  # doc1: grams abcde,bcdef
    bench = [(9, "a b c d e f")]
    r = _run(spark, docs, bench, n=5, min_overlap=2)
    assert r[1] == (2, True)   # both grams hit
    assert r[2] == (1, False)  # only abcde hits, below threshold


def test_short_doc_whole_text_gram(spark):
    # docs shorter than n collapse to one whole-text gram (same rule
    # as the minhash shingles), so exact short matches still flag
    docs = [(1, "tiny eval prompt")]
    bench = [(9, "tiny eval prompt")]
    r = _run(spark, docs, bench, n=5)
    assert r[1] == (1, True)


def test_no_broadcast_parity(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "some other words entirely different from those five grams"),
    ]
    bench = [(9, "quick brown fox jumps over the")]
    a = _run(spark, docs, bench, n=5, broadcast_bench=True)
    b = _run(spark, docs, bench, n=5, broadcast_bench=False)
    assert a == b


def test_map_mode_parity(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a b c d e f"),
        (3, "tiny"),
        (4, "nothing shared here with anything else whatsoever today friend"),
    ]
    bench = [(9, "quick brown fox jumps over the lazy"), (10, "a b c d e f g")]
    a = _run(spark, docs, bench, n=5, min_overlap=2, mode="join")
    b = _run(spark, docs, bench, n=5, min_overlap=2, mode="map")
    assert a == b


def test_map_mode_streams(spark, tmp_path):
    """mode='map' is stateless (broadcast gram array + array_intersect),
    so it must run unchanged over a Structured Stream in append mode."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely unrelated text with no shared phrases at all"),
    ]
    bench = spark.createDataFrame(
        [(9, "quick brown fox jumps over")], "doc_id int, text string"
    )
    src = tmp_path / "docs"
    src.mkdir()
    for i, r in enumerate(rows):
        spark.createDataFrame([r], "doc_id int, text string").write.parquet(
            f"{src}/wave{i}"
        )
    stream = (
        spark.readStream.schema("doc_id int, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/wave*")
    )
    out = decontaminate(stream, bench, n=5, mode="map").select(
        "doc_id", "bench_gram_hits", "contaminated"
    )
    q = (
        out.writeStream.format("memory").queryName("decon_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        r.doc_id: (r.bench_gram_hits, r.contaminated)
        for r in spark.sql("select * from decon_t").collect()
    }
    assert got == {1: (1, True), 2: (0, False)}
