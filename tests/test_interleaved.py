"""Interleaved span-document operators (the engine's payload shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.operators.interleaved import (
    media_manifest, render_for_training, span_integrity,
)

SCHEMA = (
    "doc_id int, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _doc(spark, spans, doc_id=1):
    return spark.createDataFrame([(doc_id, spans)], SCHEMA)


def test_render_orders_by_offset_and_aligns_refs(spark):
    # spans intentionally out of offset order
    spans = [
        ("media", "", "/img/b", 3),
        ("text", "hello", "", 0),
        ("media", "", "/img/a", 1),
        ("text", "world", "", 2),
    ]
    r = _doc(spark, spans).select(render_for_training("spans").alias("r")).collect()[0].r
    assert r.text == "hello <|image|> world <|image|>"
    assert r.media_refs == ["/img/a", "/img/b"]  # placeholder order, not input order


def test_render_custom_token_and_empty(spark):
    out = _doc(spark, []).select(
        render_for_training("spans", media_token="<video>").alias("r")
    ).collect()[0].r
    assert out.text == "" and out.media_refs == []


def test_span_integrity_detects_gaps_and_dups(spark):
    good = [("text", "a", "", 0), ("media", "", "/m", 1)]
    gap = [("text", "a", "", 0), ("text", "b", "", 2)]
    dup = [("text", "a", "", 0), ("text", "b", "", 0)]
    df = spark.createDataFrame([(1, good), (2, gap), (3, dup), (4, [])], SCHEMA)
    out = {r.doc_id: r.s for r in df.select("doc_id", span_integrity("spans").alias("s")).collect()}
    assert out[1].offsets_ok and out[1].n_text == 1 and out[1].n_media == 1
    assert out[1].text_chars == 1
    assert not out[2].offsets_ok
    assert not out[3].offsets_ok
    assert out[4].offsets_ok and out[4].n_spans == 0


def test_media_manifest_shared_refs(spark):
    df = spark.createDataFrame(
        [
            (1, [("media", "", "/img/x", 0), ("media", "", "/img/x", 1)]),
            (2, [("media", "", "/img/x", 0), ("media", "", "/img/y", 1)]),
            (3, [("text", "no media here", "", 0)]),
        ],
        SCHEMA,
    )
    man = {r.media_ref: r for r in media_manifest(df).collect()}
    assert man["/img/x"].n_docs == 2 and man["/img/x"].n_uses == 3
    assert man["/img/y"].n_docs == 1 and man["/img/y"].n_uses == 1
    assert "/img/" not in man  # text spans contribute nothing
