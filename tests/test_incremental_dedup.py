"""Incremental near-dup dedup against a persisted minhash index.

Covers: planted near-dup detection through the index (not via text),
the signature-agreement estimator's bounds, the write/read/append
roundtrip, and the broadcast plan shape (the index side must not be
the build side of a shuffle join when the new batch is broadcast).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.dedup import (
    dedup_incremental,
    minhash_bands,
    minhash_signature,
    read_minhash_index,
    write_minhash_index,
)

BASE = (
    "the quick brown fox jumps over the lazy dog near the riverbank "
    "while the sun sets slowly behind the distant purple mountains"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, BASE),
        (2, "completely unrelated text about spark shuffle partitions and joins"),
        (3, "another document with its own words entirely detached from others"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def index(corpus):
    sig = minhash_signature(corpus, "text", "doc_id", num_perm=8, shingle_n=3)
    return sig, minhash_bands(sig, "doc_id", rows_per_band=2)


def test_planted_dup_detected(spark, index):
    sig, bands = index
    new = spark.createDataFrame(
        [
            (101, BASE + " tail"),  # near-dup of doc 1
            (102, "fresh novel content that matches nothing in the index at all"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedup_incremental(
            new, sig, bands, num_perm=8, rows_per_band=2, threshold=0.5
        ).collect()
    }
    assert out[101]["is_dup"] and out[101]["matched_id"] == 1
    assert 0.5 <= out[101]["est_jaccard"] <= 1.0
    assert not out[102]["is_dup"]
    assert out[102]["matched_id"] is None and out[102]["est_jaccard"] is None


def test_exact_copy_estimates_one(spark, index):
    sig, bands = index
    new = spark.createDataFrame([(200, BASE)], ["doc_id", "text"])
    row = dedup_incremental(new, sig, bands, num_perm=8, rows_per_band=2).collect()[0]
    assert row["est_jaccard"] == pytest.approx(1.0)
    assert row["is_dup"]


def test_index_roundtrip_and_append(spark, corpus, tmp_path):
    path = str(tmp_path / "mh_index")
    write_minhash_index(corpus, path, num_perm=8, rows_per_band=2)
    sig, bands = read_minhash_index(spark, path)
    assert sig.count() == 3 * 8
    assert set(bands.columns) == {"doc_id", "band", "band_key"}
    assert bands.count() == 3 * 4

    # admit a new batch, append it, and the NEXT batch dedups against it
    batch1 = spark.createDataFrame(
        [(50, "a brand new page about watermark state eviction in streams")],
        ["doc_id", "text"],
    )
    write_minhash_index(batch1, path, num_perm=8, rows_per_band=2, mode="append")
    sig2, bands2 = read_minhash_index(spark, path)
    assert sig2.count() == 4 * 8

    batch2 = spark.createDataFrame(
        [(60, "a brand new page about watermark state eviction in streams")],
        ["doc_id", "text"],
    )
    row = dedup_incremental(batch2, sig2, bands2, num_perm=8, rows_per_band=2).collect()[0]
    assert row["is_dup"] and row["matched_id"] == 50


def test_new_side_broadcast_plan(spark, index):
    sig, bands = index
    new = spark.createDataFrame([(300, BASE)], ["doc_id", "text"])
    out = dedup_incremental(new, sig, bands, num_perm=8, rows_per_band=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_no_band_collision_rows_survive(spark, index):
    """Every new doc appears exactly once in the output, dup or not."""
    sig, bands = index
    new = spark.createDataFrame(
        [(i, f"unique text number {i} with nothing shared across docs") for i in range(5)],
        ["doc_id", "text"],
    )
    out = dedup_incremental(new, sig, bands, num_perm=8, rows_per_band=2)
    assert out.count() == 5
    assert out.filter(F.col("is_dup")).count() == 0
