"""Sequence packing, PII redaction, vocab coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.packing import pack_sequences, pack_summary
from crawl4ai_spark.operators.pii import pii_counts, redact_pii
from crawl4ai_spark.operators.text import vocab_coverage


def _docs(spark, n, parts=1):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 90 + 10).cast("int").alias("n_tokens")
    ).repartition(parts)


# ── packing ──────────────────────────────────────────────────────────

def test_pack_sequences_stream_invariants(spark):
    packed = pack_sequences(_docs(spark, 500), "doc_id", "n_tokens", seq_len=128, n_buckets=4)
    rows = packed.collect()
    assert len(rows) == 500
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    for b, grp in by_bucket.items():
        grp = sorted(grp, key=lambda r: r.start_offset)
        # offsets tile the bucket stream exactly: next start = prev start + prev tokens
        off = 0
        for r in grp:
            assert r.start_offset == off
            assert r.seq_id == b * (1 << 32) + off // 128
            off += r.n_tokens


def test_pack_sequences_partition_invariance(spark):
    a = pack_sequences(_docs(spark, 300, 1), "doc_id", "n_tokens", 128, 4)
    b = pack_sequences(_docs(spark, 300, 7), "doc_id", "n_tokens", 128, 4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_summary_fill(spark):
    packed = pack_sequences(_docs(spark, 500), "doc_id", "n_tokens", 128, 4)
    summ = {r.seq_id: r for r in pack_summary(packed, 128).collect()}
    total = sum(r.tokens_started for r in summ.values())
    assert total == sum(r.n_tokens for r in packed.collect())
    assert all(r.n_docs >= 1 for r in summ.values())


# ── PII ──────────────────────────────────────────────────────────────

def test_redact_pii_each_kind(spark):
    df = spark.createDataFrame(
        [("mail me at jo.doe+x@sub.example.org now",),
         ("server 192.168.10.7 answered",),
         ("call 555-867-5309 or +44 nothing",),
         ("clean text with no identifiers",)],
        "text string",
    )
    out = [r.t for r in df.select(redact_pii("text").alias("t")).collect()]
    assert out[0] == "mail me at <EMAIL> now"
    assert out[1] == "server <IP> answered"
    assert out[2] == "call <PHONE> or +44 nothing"
    assert out[3] == "clean text with no identifiers"


def test_pii_counts_no_double_count(spark):
    # the IP-looking run inside an email must count once, as email
    df = spark.createDataFrame([("x 1.2.3.4@a.co and 5.6.7.8 and 555-123-4567",)], "text string")
    r = df.select(pii_counts("text").alias("c")).collect()[0].c
    assert (r.n_email, r.n_ip, r.n_phone) == (1, 1, 1)


# ── vocab coverage ───────────────────────────────────────────────────

def test_vocab_coverage_order_and_bounds(spark):
    df = spark.createDataFrame(
        [("a a a b b c",), ("A b  c",)], "text string"
    )
    rows = vocab_coverage(df, "text", top_k=2).orderBy("rank").collect()
    assert [(r.word, r.cnt, r.rank) for r in rows] == [("a", 4, 1), ("b", 3, 2)]
    # coverage over total 9 words: 4/9 then 7/9
    assert rows[0].coverage == pytest.approx(4 / 9, abs=1e-6)
    assert rows[1].coverage == pytest.approx(7 / 9, abs=1e-6)
