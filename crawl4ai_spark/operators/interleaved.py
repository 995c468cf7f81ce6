"""Operators over interleaved text+media span documents — the engine's
native payload shape: (doc_id, spans: array<struct<kind, text,
media_ref, offset>>), as produced by the crawl extract pipeline.

Three things a multimodal training pipeline does with that table:

- `render_for_training` — flatten a span document into one training
  string with a placeholder token per media span plus the media_refs
  aligned IN PLACEHOLDER ORDER (how interleaved image-text corpora are
  fed to multimodal LLMs: the i-th placeholder binds to the i-th ref).
- `span_integrity` — data-quality gate: span counts, text mass, and
  whether offsets tile 0..n-1 exactly (a broken writer shows up here
  before it poisons training).
- `media_manifest` — corpus-wide media usage table (ref → docs using
  it, total uses): the dedup/join key for fetching or embedding each
  asset once, however many documents cite it.

All per-row work is HOF expressions over the spans array (no explode
until the manifest, which explodes media spans only — a narrow
projection of (id, ref)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sort_spans", "render_for_training", "span_integrity", "media_manifest"]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def sort_spans(spans) -> Column:
    """Spans ordered by their offset field (writers may shuffle)."""
    return F.array_sort(
        _col(spans),
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )


def render_for_training(spans, media_token: str = "<|image|>", sep: str = " ") -> Column:
    """struct<text, media_refs>: the flattened training string (text
    spans verbatim, media spans as `media_token`) and the refs aligned
    with placeholder order."""
    s = sort_spans(spans)
    text = F.array_join(
        F.transform(
            s, lambda x: F.when(x["kind"] == "text", x["text"]).otherwise(F.lit(media_token))
        ),
        sep,
    )
    refs = F.transform(
        F.filter(s, lambda x: x["kind"] == "media"), lambda x: x["media_ref"]
    )
    return F.struct(text.alias("text"), refs.alias("media_refs"))


def span_integrity(spans) -> Column:
    """struct<n_spans, n_text, n_media, text_chars, offsets_ok>;
    offsets_ok ⇔ the offset multiset is exactly {0..n-1}."""
    s = _col(spans)
    n = F.size(s)
    offs = F.array_sort(F.transform(s, lambda x: x["offset"]))
    ok = F.when(n == 0, F.lit(True)).otherwise(
        offs == F.sequence(F.lit(0), n - 1)
    )
    return F.struct(
        n.alias("n_spans"),
        F.size(F.filter(s, lambda x: x["kind"] == "text")).alias("n_text"),
        F.size(F.filter(s, lambda x: x["kind"] == "media")).alias("n_media"),
        F.aggregate(
            s, F.lit(0),
            lambda a, x: a + F.when(x["kind"] == "text", F.length(x["text"])).otherwise(F.lit(0)),
        ).alias("text_chars"),
        ok.alias("offsets_ok"),
    )


def media_manifest(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """(media_ref, n_docs, n_uses) over the whole corpus — one row per
    distinct asset.  Shape: explode media spans only (narrow (id, ref)
    rows), one ref-keyed agg with map-side combine; a boilerplate asset
    cited by 10^9 docs is still one output row and its skew is absorbed
    by the partial aggregation."""
    refs = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.transform(
                F.filter(_col(spans_col), lambda x: x["kind"] == "media"),
                lambda x: x["media_ref"],
            )
        ).alias("media_ref"),
    )
    return refs.groupBy("media_ref").agg(
        F.countDistinct("_id").cast("int").alias("n_docs"),
        F.count("*").cast("int").alias("n_uses"),
    )
