"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side architecture is fully real — schemas, partition-aware
batch iteration via mapInPandas, Arrow batch shapes, deterministic
batching — while the codec work itself is stubbed: this container has
no image/audio libraries, so `decode_image` raises NotImplementedError
unless `fake=True`, in which case a deterministic hash-derived feature
vector stands in for real pixels (stable across runs/engines, usable
in tests and benchmarks).

At scale: media blobs are the widest column by far — these operators
take (id, blob) projections only (column pruning keeps the scan
narrow), and mapInPandas streams Arrow batches so one task never
materializes more than spark.sql.execution.arrow.maxRecordsPerBatch
blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, MapType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("doc_id", StringType()),
    StructField("media_type", StringType()),      # image | audio | video
    StructField("blob", BinaryType()),
    StructField("meta", MapType(StringType(), StringType())),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    # double, not float: feature values must survive a round(…, 6)
    # comparison against an engine that computes in float64
    StructField("features", ArrayType(DoubleType())),
])


def decode_image(blob: bytes, *, fake: bool = False) -> dict:
    """Decode one image blob → dims + feature vector.

    Real decoding requires an image library this container doesn't
    ship; pass fake=True for the deterministic stand-in (dims and a
    16-dim feature vector derived from md5 of the bytes — md5 so the
    DuckDB correctness oracle can re-derive identical values)."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv (not in this container); "
            "use fake=True for the deterministic stand-in"
        )
    digest = hashlib.md5(blob or b"").digest()
    rnd = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
    return {
        "width": 64 + int(digest[0]) * 4,
        "height": 64 + int(digest[1]) * 4,
        "n_bytes": len(blob or b""),
        "features": (rnd / 255.0).tolist(),
    }


def extract_image_features(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """media(media_id, blob, …) → per-image features via mapInPandas.
    Only (media_id, blob) are read — keep the scan narrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["blob"]):
                d = decode_image(bytes(blob) if blob is not None else b"", fake=fake)
                rows.append({"media_id": mid, **d})
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "n_bytes", "features"])

    return media.select("media_id", "blob").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256, *, fake: bool = True) -> DataFrame:
    """Resize stub: real implementation decodes+resizes per batch; the
    stand-in rewrites meta with the target dims (the Spark plumbing —
    batch shapes, schema, pushdown — is what's under test)."""
    out_schema = StructType([
        StructField("media_id", StringType()),
        StructField("blob", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["blob"]):
                d = decode_image(bytes(blob) if blob is not None else b"", fake=fake)
                scale = max(d["width"], d["height"]) / max_side
                w = int(d["width"] / scale) if scale > 1 else d["width"]
                h = int(d["height"] / scale) if scale > 1 else d["height"]
                rows.append({"media_id": mid, "blob": blob,
                             "meta": {"width": str(w), "height": str(h), "resized": "1"}})
            yield pd.DataFrame(rows, columns=["media_id", "blob", "meta"])

    return media.select("media_id", "blob").mapInPandas(run, out_schema)


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stub: emits deterministic frame indices per video
    (real impl would demux with ffmpeg).  Native-only: frame count is
    derived from blob length, indices via sequence()."""
    n_frames = (F.coalesce(F.length(F.col("blob")), F.lit(0)) / 1000 + 1).cast("int")
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def media_from_docs(docs: DataFrame) -> DataFrame:
    """Build the media table from the docs table's media spans:
    (media_id, doc_id, media_type, blob, meta) with a deterministic
    synthetic blob per media_ref (sandbox stand-in for fetched bytes)."""
    spans = docs.select(
        F.col("doc_id"), F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "media")
    return spans.select(
        F.concat_ws("#", "doc_id", F.col("s.offset").cast("string")).alias("media_id"),
        "doc_id",
        F.lit("image").alias("media_type"),
        F.encode(F.concat(F.lit("synthetic:"), F.col("s.media_ref")), "UTF-8").cast("binary").alias("blob"),
        F.create_map(F.lit("src"), F.col("s.media_ref")).alias("meta"),
    )
