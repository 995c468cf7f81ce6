"""Cuckoo-filter seen-set: no false negatives, bounded FP, deletion,
incremental == one-shot, stash overflow, cogroup ≡ broadcast probe."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crawl4ai_spark.operators.cuckoo import (
    cuckoo_add,
    cuckoo_cardinality,
    cuckoo_delete,
    cuckoo_probe,
    cuckoo_probe_cogroup,
    empty_cuckoo,
)


def _urls(spark, lo, hi, prefix="http://example.com/p"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id")).alias("url")
    )


@pytest.fixture(scope="module")
def filt_and_urls(spark):
    inserted = _urls(spark, 0, 2000)
    filt = cuckoo_add(
        empty_cuckoo(spark, n_shards=8, m_buckets=256), inserted, n_shards=8
    ).cache()
    filt.count()
    return filt, inserted


def test_no_false_negatives(spark, filt_and_urls):
    filt, inserted = filt_and_urls
    probed = cuckoo_probe(inserted, filt, n_shards=8)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_bounded(spark, filt_and_urls):
    filt, _ = filt_and_urls
    fresh = _urls(spark, 100_000, 110_000)
    fp = cuckoo_probe(fresh, filt, n_shards=8).filter(F.col("maybe_seen")).count()
    # design FP ≈ 1.2e-4; allow 100x slack for the tiny test tables
    assert fp <= 0.01 * 10_000


def test_cogroup_probe_matches_broadcast(spark, filt_and_urls):
    filt, _ = filt_and_urls
    mixed = _urls(spark, 1000, 3000)  # half inserted, half fresh
    a = {
        r["url"]: r["maybe_seen"]
        for r in cuckoo_probe(mixed, filt, n_shards=8).collect()
    }
    b = {
        r["url"]: r["maybe_seen"]
        for r in cuckoo_probe_cogroup(mixed, filt, n_shards=8).collect()
    }
    assert a == b


def test_delete_then_probe(spark, filt_and_urls):
    filt, inserted = filt_and_urls
    gone = _urls(spark, 0, 1000)
    kept = _urls(spark, 1000, 2000)
    filt2 = cuckoo_delete(filt, gone, n_shards=8).cache()
    filt2.count()
    # kept keys: still zero false negatives
    assert (
        cuckoo_probe(kept, filt2, n_shards=8).filter(~F.col("maybe_seen")).count()
        == 0
    )
    # deleted keys: forgotten (up to the FP floor)
    still = cuckoo_probe(gone, filt2, n_shards=8).filter(F.col("maybe_seen")).count()
    assert still <= 0.01 * 1000
    # and the original filter is untouched (immutable-snapshot state)
    assert (
        cuckoo_probe(gone, filt, n_shards=8).filter(~F.col("maybe_seen")).count()
        == 0
    )


def test_incremental_equals_oneshot(spark):
    base = empty_cuckoo(spark, n_shards=4, m_buckets=128)
    a1 = cuckoo_add(base, _urls(spark, 0, 300), n_shards=4)
    a2 = cuckoo_add(a1, _urls(spark, 300, 600), n_shards=4).cache()
    oneshot = cuckoo_add(base, _urls(spark, 0, 600), n_shards=4).cache()
    allu = _urls(spark, 0, 700)
    p_inc = {
        r["url"]: r["maybe_seen"]
        for r in cuckoo_probe(allu, a2, n_shards=4).collect()
    }
    p_one = {
        r["url"]: r["maybe_seen"]
        for r in cuckoo_probe(allu, oneshot, n_shards=4).collect()
    }
    # identical membership verdicts: same keys, same hash derivations,
    # order of insertion does not change the fingerprint set
    for u in p_inc:
        if u < "http://example.com/p600":  # inserted range
            assert p_inc[u] and p_one[u]


def test_stash_overflow_keeps_no_false_negatives(spark):
    # 2 shards x 16 buckets x 4 slots = 128 slots; insert 200 keys →
    # guaranteed overflow into the stash; membership must still hold
    filt = cuckoo_add(
        empty_cuckoo(spark, n_shards=2, m_buckets=16),
        _urls(spark, 0, 200),
        n_shards=2,
    ).cache()
    probed = cuckoo_probe(_urls(spark, 0, 200), filt, n_shards=2)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    # stash actually engaged
    assert any(len(bytes(r["stash"])) > 0 for r in filt.collect())


def test_cardinality(spark, filt_and_urls):
    filt, _ = filt_and_urls
    assert cuckoo_cardinality(filt) == 2000


def test_hash_col_mode(spark):
    """Pre-hashed 64-bit key column (the crawl loop's url_hash path)."""
    keys = _urls(spark, 0, 500).select(F.xxhash64("url").alias("url_hash"))
    filt = cuckoo_add(
        empty_cuckoo(spark, n_shards=4, m_buckets=128),
        keys,
        n_shards=4,
        hash_col="url_hash",
    ).cache()
    probed = cuckoo_probe(keys, filt, n_shards=4, hash_col="url_hash")
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_insert_once_then_single_delete_is_exact(spark):
    """Delete-exactness under the caller contract (insert each key at
    most once — what the engine and streaming crawl guarantee via
    their seen gates): one cuckoo_delete of every inserted key leaves
    the filter probing definitely-new for those keys, and intra-batch
    same-key duplicates dedup at insert (same h1 places once)."""
    base = _urls(spark, 0, 500)
    # duplicate rows WITHIN the insert batch dedup (same key ⇒ one copy)
    filt = cuckoo_add(empty_cuckoo(spark, n_shards=4, m_buckets=256),
                      base.unionAll(base), n_shards=4).cache()
    filt.count()
    gone = cuckoo_delete(filt, base, n_shards=4)
    assert (
        cuckoo_probe(base, gone, n_shards=4)
        .filter(F.col("maybe_seen")).count() == 0
    )


def test_collision_duplicates_keep_delete_safe(spark):
    """Fan et al. duplicate semantics: two DISTINCT keys colliding on
    (shard, bucket, fingerprint) both place a copy, so deleting one
    key can NEVER turn the other into a false negative — the
    seen-filter contract ('False ⇒ definitely not inserted') survives
    deletion."""
    import numpy as np
    import pyspark.sql.functions as F2

    from crawl4ai_spark.operators.cuckoo import _derive

    # find two distinct urls that collide end-to-end in a 1-shard,
    # 64-bucket filter (small table ⇒ collisions easy to mine)
    urls = [f"http://c.test/{i}" for i in range(20000)]
    hdf = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url", F2.xxhash64("url").alias("h")
    ).collect()
    seen: dict[tuple, str] = {}
    pair = None
    for r in hdf:
        fp, i1, i2 = _derive(np.array([r["h"]], dtype=np.int64), 64)
        key = (int(fp[0]), min(int(i1[0]), int(i2[0])), max(int(i1[0]), int(i2[0])))
        if key in seen and seen[key] != r["url"]:
            pair = (seen[key], r["url"])
            break
        seen[key] = r["url"]
    assert pair is not None, "no (fp, buckets) collision found in 20k urls"
    a, b = pair

    both = spark.createDataFrame([(a,), (b,)], "url string")
    filt = cuckoo_add(empty_cuckoo(spark, n_shards=1, m_buckets=64),
                      both, n_shards=1).cache()
    filt.count()
    # delete A: B's copy must survive — no false negative for B
    after = cuckoo_delete(
        filt, spark.createDataFrame([(a,)], "url string"), n_shards=1
    )
    b_row = cuckoo_probe(
        spark.createDataFrame([(b,)], "url string"), after, n_shards=1
    ).collect()[0]
    assert b_row["maybe_seen"] is True
