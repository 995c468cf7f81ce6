"""Streaming incremental dedup against the persisted minhash index:
the map-only array-layout signature equals the batch long layout, and
the stream emits exactly the batch `dedup_incremental` matches."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from crawl4ai_spark.operators.dedup import (
    band_keys_arr,
    dedup_incremental,
    minhash_bands,
    minhash_signature,
    minhash_signature_arr,
    sig_long_to_arr,
)
from crawl4ai_spark.streaming.continuous import stream_dedup_incremental

BASE = (
    "the quick brown fox jumps over the lazy dog near the riverbank "
    "while the sun sets slowly behind the distant purple mountains"
)


def test_array_signature_equals_long_layout(spark):
    docs = spark.createDataFrame(
        [(1, BASE), (2, "short text"), (3, "one"), (4, "")],
        ["doc_id", "text"],
    )
    long = {
        (r["doc_id"], r["perm"]): r["minhash"]
        for r in minhash_signature(docs, num_perm=8, shingle_n=3).collect()
    }
    arr = {
        r["doc_id"]: r["sig"]
        for r in minhash_signature_arr(docs, num_perm=8, shingle_n=3).collect()
    }
    for doc_id, sig in arr.items():
        assert len(sig) == 8
        for p, mh in enumerate(sig):
            assert long[(doc_id, p)] == mh
    # and the pivot helper inverts the long layout
    piv = {
        r["doc_id"]: r["sig"]
        for r in sig_long_to_arr(minhash_signature(docs, num_perm=8, shingle_n=3)).collect()
    }
    assert piv == arr


def test_band_keys_match_grouped_bands(spark):
    docs = spark.createDataFrame([(1, BASE), (2, "alpha beta gamma delta")],
                                 ["doc_id", "text"])
    sig = minhash_signature(docs, num_perm=8, shingle_n=3)
    grouped = {
        (r["doc_id"], r["band"]): r["band_key"]
        for r in minhash_bands(sig, rows_per_band=2).collect()
    }
    arr = minhash_signature_arr(docs, num_perm=8, shingle_n=3).select(
        "doc_id",
        F.posexplode(band_keys_arr(F.col("sig"), 8, 2)).alias("band", "band_key"),
    )
    for r in arr.collect():
        assert grouped[(r["doc_id"], r["band"])] == r["band_key"]


def test_stream_matches_batch(spark, tmp_path):
    corpus = spark.createDataFrame(
        [
            (1, BASE),
            (2, "completely unrelated text about spark shuffle partitions and joins"),
        ],
        ["doc_id", "text"],
    )
    index_sig = minhash_signature(corpus, num_perm=8, shingle_n=3)
    index_bands = minhash_bands(index_sig, rows_per_band=2)

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    new_rows = [
        (101, BASE + " tail", t0),                                       # near-dup of 1
        (102, "novel content matching nothing in the admitted corpus", t0),
    ]
    new = spark.createDataFrame(new_rows, "doc_id long, text string, ts timestamp")

    src = str(tmp_path / "src")
    new.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(new.schema).parquet(src)

    out = stream_dedup_incremental(
        stream, index_sig, index_bands,
        num_perm=8, rows_per_band=2, threshold=0.5,
    )
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)

    got = {
        r["doc_id"]: (r["matched_id"], round(r["est_jaccard"], 6))
        for r in spark.read.parquet(sink).collect()
    }
    batch = {
        r["doc_id"]: (r["matched_id"], round(r["est_jaccard"], 6))
        for r in dedup_incremental(
            new.drop("ts"), index_sig, index_bands,
            num_perm=8, rows_per_band=2, threshold=0.5,
        ).filter(F.col("is_dup")).collect()
    }
    assert got == batch
    assert 101 in got and got[101][0] == 1
    assert 102 not in got  # non-dup emits nothing
    # multi-band hits of the same pair collapsed to one row
    assert spark.read.parquet(sink).count() == len(got)
