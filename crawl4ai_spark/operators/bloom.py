"""Partitioned bloom-filter sidecar for the URL-seen set (SURVEY
§4.2.3; reference semantics: deep_crawling/crazy.py:102-165).

At 10^10 URLs the exact seen table is ~80 GB of hashes; the bloom
sidecar is the cheap prefilter that keeps MOST candidates away from
the anti-join shuffle:

    candidates ──might_contain?──┬─ no  → definitely fresh (skip join)
                                 └─ maybe → exact anti-join decides

False positives only send extra rows to the exact join (never a
false drop); false negatives cannot happen for inserted keys.

Layout: `n_buckets` independent filters keyed by pmod(url_hash,
n_buckets).  Build = groupBy(bucket).applyInPandas over numpy
bitarrays (vectorized Arrow path); each bucket's bits serialize to a
binary cell, so the whole sidecar is an ordinary small table that
snapshots/restores through the SnapshotStore like any other state.
Probe hashes are Kirsch-Mitzenmacher double hashing g_i = h1 + i·h2
over the JVM-computed xxhash64 pair — Python never hashes strings.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, IntegerType, StructField, StructType

BLOOM_SCHEMA = StructType([
    StructField("bucket", IntegerType()),
    StructField("bits", BinaryType()),
])


def _probe_positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int) -> Iterator[np.ndarray]:
    for i in range(k):
        yield ((h1 + i * h2) % m_bits).astype(np.int64)


def with_hash_pair(df: DataFrame, key_col: str = "url") -> DataFrame:
    """Adds h1/h2 (both JVM-side xxhash64; h2 = hash of h1)."""
    return df.withColumn("h1", F.xxhash64(key_col)).withColumn("h2", F.xxhash64(F.col("h1")))


def build_bloom(
    df: DataFrame, key_col: str = "url",
    n_buckets: int = 16, m_bits: int = 1 << 16, k: int = 5,
) -> DataFrame:
    """Build the sidecar table (bucket, bits) from a key column."""
    hashed = with_hash_pair(df.select(key_col).distinct(), key_col).withColumn(
        "bucket", F.pmod(F.col("h1"), F.lit(n_buckets)).cast("int")
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        h1 = pdf["h1"].to_numpy(dtype=np.uint64)
        h2 = pdf["h2"].to_numpy(dtype=np.uint64)
        for pos in _probe_positions(h1, h2, k, m_bits):
            np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "bits": [bits.tobytes()]})

    return hashed.groupBy("bucket").applyInPandas(build, BLOOM_SCHEMA)


def merge_bloom(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two sidecars (incremental build across iterations)."""

    def orit(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for blob in pdf["bits"]:
            arr = np.frombuffer(blob, dtype=np.uint8)
            acc = arr.copy() if acc is None else (acc | arr)
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "bits": [acc.tobytes()]})

    return a.unionByName(b).groupBy("bucket").applyInPandas(orit, BLOOM_SCHEMA)


def might_contain(
    df: DataFrame, bloom: DataFrame, key_col: str = "url",
    n_buckets: int = 16, m_bits: int = 1 << 16, k: int = 5,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Probe: adds a boolean `out_col`.  The sidecar is collected and
    broadcast (n_buckets·m_bits/8 bytes — size it to executor memory;
    at 10^10 keys shard n_buckets up and broadcast per executor)."""
    blobs = {int(r["bucket"]): np.frombuffer(r["bits"], dtype=np.uint8)
             for r in bloom.collect()}
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(blobs)

    hashed = with_hash_pair(df, key_col).withColumn(
        "bucket", F.pmod(F.col("h1"), F.lit(n_buckets)).cast("int")
    )

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def probe(h1: pd.Series, h2: pd.Series, bucket: pd.Series) -> pd.Series:
        blobs_l = bc.value
        a1 = h1.to_numpy(dtype=np.uint64)
        a2 = h2.to_numpy(dtype=np.uint64)
        bk = bucket.to_numpy()
        out = np.zeros(len(a1), dtype=bool)
        for b in np.unique(bk):
            bits = blobs_l.get(int(b))
            mask = bk == b
            if bits is None:
                continue  # empty bucket → definitely not present
            hit = np.ones(mask.sum(), dtype=bool)
            for pos in _probe_positions(a1[mask], a2[mask], k, m_bits):
                hit &= (bits[pos // 8] >> (pos % 8) & 1).astype(bool)
            out[mask] = hit
        return pd.Series(out)

    return hashed.withColumn(out_col, probe("h1", "h2", "bucket")).drop("h1", "h2", "bucket")


# ── native split-block bloom (the crawl-loop path) ───────────────────
#
# The applyInPandas sidecar above is the general-purpose tool; the
# crawl loop instead uses a SPLIT-BLOCK bloom (the Parquet bloom-filter
# design, word-sized blocks): all k bits of a key live in ONE 64-bit
# word, so build is a plain `groupBy(word).agg(bit_or(mask))` and probe
# is a broadcast join + two bitwise ops — zero Python, zero driver
# collect, and the filter is an ordinary DataFrame that snapshots
# through the store like any other state.
#
# Layout: word index = pmod(h, n_words) (low bits); the 4 mask bit
# positions come from the TOP 24 bits of h (disjoint from the index
# bits, keeping block choice and in-block bits independent).
# FP rate at load L keys/word: ~(popcount/64)^4 — e.g. 2 keys/word →
# ~8 bits set → (8/64)^4 ≈ 2.4e-4.  No false negatives by
# construction, so a "definitely new" verdict is always safe.

BLOOM_MASK_BITS = 4


def blocked_mask(hash_expr: str) -> Column:
    """64-bit word with 4 bits set, positions taken from the hash's top
    bits.  Built as a SQL expression because shiftleft's bit count must
    be an expression here (the pyspark wrapper only takes literals)."""
    parts = [
        "shiftleft(CAST(1 AS BIGINT), "
        f"CAST(shiftrightunsigned({hash_expr}, {64 - 6 * (j + 1)}) & 63 AS INT))"
        for j in range(BLOOM_MASK_BITS)
    ]
    return F.expr("(" + " | ".join(parts) + ")")


def blocked_bloom_build(df: DataFrame, hash_col: str, n_words: int) -> DataFrame:
    """(word int, bits long) table from a 64-bit hash column.  One
    map-side-combined aggregation; output has ≤ n_words rows."""
    h = F.col(hash_col)
    return (
        df.select(
            F.pmod(h, F.lit(n_words)).cast("int").alias("word"),
            blocked_mask(hash_col).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def blocked_bloom_probe(
    df: DataFrame, bloom: DataFrame, hash_col: str, n_words: int,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Adds boolean `out_col`: False ⇒ key definitely not in the set.
    The bloom side is broadcast (n_words·16 B — a few MB even at 10^8
    keys; at 10^10 swap the broadcast for a co-partitioned join on
    `word`, same plan shape)."""
    h = F.col(hash_col)
    probe = df.withColumn("_w", F.pmod(h, F.lit(n_words)).cast("int"))
    joined = probe.join(
        F.broadcast(bloom.withColumnRenamed("word", "_w")), "_w", "left"
    )
    mask = blocked_mask(hash_col)
    hit = F.col("bits").isNotNull() & (F.col("bits").bitwiseAND(mask) == mask)
    return joined.withColumn(out_col, hit).drop("_w", "bits")


def estimate_cardinality(bloom: DataFrame, m_bits: int = 1 << 16, k: int = 5) -> float:
    """Bloom cardinality estimate n = -(m/k)·ln(1 - X/m) summed over
    buckets (crazy.py:140-158 semantics)."""
    import math

    total = 0.0
    for r in bloom.collect():
        bits = np.frombuffer(r["bits"], dtype=np.uint8)
        x = int(np.unpackbits(bits).sum())
        if x >= m_bits:
            total += float(m_bits)
        else:
            total += -(m_bits / k) * math.log(1.0 - x / m_bits)
    return total
