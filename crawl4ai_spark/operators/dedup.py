"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first — the standard cascade for a 100 TB corpus:

1. exact      — md5 of normalized text, groupBy keep-first.  One
                shuffle on a 16-byte key; at scale this is the
                cheapest possible dedup and removes the bulk.
2. minhash+LSH — shingle → k minhash signatures → b bands →
                bucket-join: only documents sharing a band bucket are
                compared.  Near-dup detection with sub-quadratic join
                fan-out; bands shuffle on (band, bucket-hash) keys.
3. simhash    — 64-bit sign-sum fingerprint; hamming-adjacent
                candidates via 4×16-bit chunk banding.
4. n-gram Jaccard — exact verification on candidate pairs only
                (explode shingles → pair intersection counts).

MinHash here uses md5(shingle ∥ permutation-id) with lexicographic
min — deterministic and reproducible across engines (the correctness
oracle recomputes it in DuckDB SQL with identical results), at the
cost of ~2× the hash work of xxhash64; swap `_minhash_fn` for
xxhash64 when oracle portability isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawl4ai_spark.operators.text import fingerprint

__all__ = [
    "normalize_text",
    "dedup_exact",
    "shingles",
    "minhash_signature",
    "minhash_bands",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "simhash64",
    "simhash_candidate_pairs",
    "write_minhash_index",
    "read_minhash_index",
    "dedup_incremental",
    "minhash_signature_arr",
    "band_keys_arr",
    "sig_long_to_arr",
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(text) -> Column:
    return F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")


# ── 1. exact dedup ────────────────────────────────────────────────────

def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per exact-content group.
    Adds `content_hash` and `dup_count` (group size)."""
    w = Window.partitionBy("content_hash").orderBy(F.asc(id_col))
    return (
        df.withColumn("content_hash", fingerprint(text_col))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("dup_count", F.count("*").over(Window.partitionBy("content_hash")))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ── 2. shingles + minhash + LSH ───────────────────────────────────────

def shingles(text, n: int = 3) -> Column:
    """Word n-gram shingles of normalized text, distinct."""
    words = F.filter(F.split(normalize_text(text), " "), lambda w: w != F.lit(""))
    k = F.size(words) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", words))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            )
        )
    )


def _minhash_fn(shingle: Column, perm: int) -> Column:
    # md5 is reproducible in DuckDB → usable as the correctness oracle.
    return F.md5(F.concat(shingle, F.lit(f"#p{perm}")))


def _rebalance(df: DataFrame, key: str) -> DataFrame:
    """Spread expression-dense per-row work (shingle explode × k
    hashes) across every core when the upstream scan yielded fewer
    splits than the session's parallelism — a single small parquet
    file / lone row group pipelines the whole corpus onto one task
    otherwise (parquet cannot split below row-group granularity).
    No-op on well-split inputs: a 100 TB scan already arrives with
    ≥ cores partitions, so no extra exchange is paid at scale."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df


def minhash_signature(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 16, shingle_n: int = 3) -> DataFrame:
    """(id, perm, minhash): k permutations per document.  Long layout
    (not a signature array) so banding is a groupBy, not an explode."""
    sh = _rebalance(df, id_col).select(
        F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("shingle")
    )
    # One pass over the exploded shingle table: k min-aggregates in a
    # single groupBy (one shuffle), then a narrow stack() unpivot back to
    # the long layout.  (Round 1 unioned num_perm copies of the explode —
    # num_perm shuffles of the full shingle volume.)
    aggs = [F.min(_minhash_fn(F.col("shingle"), p)).alias(f"_m{p}") for p in range(num_perm)]
    wide = sh.groupBy(id_col).agg(*aggs)
    stack = "stack({}, {}) as (perm, minhash)".format(
        num_perm, ", ".join(f"{p}, _m{p}" for p in range(num_perm))
    )
    return wide.select(F.col(id_col), F.expr(stack))


def minhash_bands(sig: DataFrame, id_col: str = "doc_id",
                  rows_per_band: int = 4) -> DataFrame:
    """(id, band, band_key): LSH banding of a long-layout signature.
    band_key concatenates the band's sorted minhashes — docs agreeing
    on ALL rows of a band share its key."""
    return (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.concat_ws("|", F.array_sort(F.collect_list("minhash"))).alias("band_key"))
    )


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id",
                        bands: int = 4, rows_per_band: int = 4) -> DataFrame:
    """Band the signature and self-join on (band, band_key):
    candidate pairs are docs agreeing on ALL rows of ≥1 band.
    Output: (a, b) with a < b, distinct."""
    banded = minhash_bands(sig, id_col, rows_per_band)
    left = banded.select(F.col(id_col).alias("a"), "band", "band_key")
    right = banded.select(F.col(id_col).alias("b"), "band", "band_key")
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# ── 4. exact n-gram Jaccard (verification / standalone) ───────────────

def jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  shingle_n: int = 3, threshold: float = 0.8,
                  candidates: DataFrame | None = None,
                  max_df: int | None = None) -> DataFrame:
    """Exact Jaccard over word-shingle sets.

    Candidate generation (who gets compared):
      - `candidates` given → verify exactly those (a, b) pairs.
      - `max_df` given → pairs sharing ≥1 *rare* shingle (document
        frequency ≤ max_df).  The hot-shingle cutoff is the scale guard:
        a stop-shingle appearing in 10^6 docs would otherwise make the
        inverted-index self-join quadratic.  Pairs whose overlap is ONLY
        hot shingles are skipped — at high thresholds those can't pass
        anyway unless both docs are mostly boilerplate.
      - neither → all pairs sharing ≥1 shingle (full inverted index).

    Intersection counts are always exact over the FULL shingle sets of
    the candidate pairs (candidate-driven double equi-join, bounded by
    |candidates| × shingles-per-doc — never candidates × corpus)."""
    sh = _rebalance(df, id_col).select(
        F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("shingle")
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    if candidates is None and max_df is not None:
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        rare = sh.join(
            dfreq.filter(F.col("_df") <= max_df).select("shingle"), "shingle", "left_semi"
        )
        candidates = (
            rare.alias("x")
            .join(rare.alias("y"), "shingle")
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .select(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
            .distinct()
        )

    if candidates is not None:
        inter = (
            candidates.join(
                sh.select(F.col(id_col).alias("a"), "shingle"), "a"
            )
            .join(sh.select(F.col(id_col).alias("b"), "shingle"), ["b", "shingle"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        inter = (
            sh.alias("x")
            .join(sh.alias("y"), "shingle")
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .groupBy(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
            .agg(F.count("*").alias("inter"))
        )
    pairs = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb")), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return pairs


# ── 3. simhash ────────────────────────────────────────────────────────

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit simhash: per word-token, xxhash64(token); per bit, sum of
    ±1 weighted by token count; fingerprint bit = sign.  All native —
    explode + one groupBy with 64 conditional sums."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(normalize_text(text_col), " "), lambda w: w != F.lit(""))
        ).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_candidate_pairs(sim: DataFrame, id_col: str = "doc_id",
                            max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates by 4×16-bit chunk banding (pigeonhole: any
    pair within hamming ≤3 agrees on ≥1 of 4 chunks), verified by
    exact popcount on the candidate pairs."""
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"c{i}")
        for i in range(4)
    ]
    t = sim.select(F.col(id_col), F.col("simhash"), *chunks)
    pairs = None
    for i in range(4):
        left = t.select(F.col(id_col).alias("a"), F.col("simhash").alias("sa"), F.col(f"c{i}").alias("k"))
        right = t.select(F.col(id_col).alias("b"), F.col("simhash").alias("sb"), F.col(f"c{i}").alias("k"))
        p = left.join(right, "k").filter(F.col("a") < F.col("b")).select("a", "b", "sa", "sb")
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.distinct()
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return pairs.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("a", "b", "hamming")


# ── 5. incremental dedup against a persisted signature index ─────────

def write_minhash_index(docs: DataFrame, path: str, text_col: str = "text",
                        id_col: str = "doc_id", num_perm: int = 8,
                        shingle_n: int = 3, rows_per_band: int = 2,
                        mode: str = "overwrite") -> None:
    """Persist the corpus's minhash index: `<path>/sig` (long-layout
    signatures) and `<path>/bands` (banded keys, PARTITIONED BY band).

    This is the artifact a continuously-crawled 100 TB corpus keeps
    beside itself so each new crawl batch deduplicates against
    EVERYTHING seen so far without re-shingling history: index size is
    n_docs × (num_perm + bands) fixed-width rows — ~100 bytes/doc —
    and `mode="append"` adds a batch's rows after it is admitted.
    Partitioning bands by `band` keeps each probe join's scan to one
    directory per band and lets AQE size the bucket-side splits.
    (With a real catalog this is a `bucket(band_key)` table and the
    probe is a storage-partitioned join; parquet stand-in here, same
    layout contract as plans/state.py.)
    """
    sig = minhash_signature(docs, text_col, id_col, num_perm, shingle_n)
    sig.write.mode(mode).parquet(f"{path}/sig")
    bands = minhash_bands(sig, id_col, rows_per_band)
    bands.write.mode(mode).partitionBy("band").parquet(f"{path}/bands")


def read_minhash_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(sig, bands) as written by `write_minhash_index`."""
    return spark.read.parquet(f"{path}/sig"), spark.read.parquet(f"{path}/bands")


def dedup_incremental(new_docs: DataFrame, index_sig: DataFrame,
                      index_bands: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 8,
                      shingle_n: int = 3, rows_per_band: int = 2,
                      threshold: float = 0.5,
                      broadcast_new: bool = True) -> DataFrame:
    """Near-dup check of a NEW batch against an existing corpus index:
    one row per new doc — (id, is_dup, matched_id, est_jaccard).

    The incremental shape is what matters at 100 TB: history is never
    re-shingled.  The new batch (small: one crawl's admissions) is
    signed and banded, then BROADCAST onto the persisted band index —
    candidate generation is a map-side join over the index scan, no
    index-side shuffle.  Similarity is the standard signature-agreement
    estimator (fraction of matching minhash components, the MinHashLSH
    estimator): E[matches/num_perm] = Jaccard(a, b), so verification
    needs only the index's fixed-width signature rows, never history's
    text.  Verification work is |candidates| × num_perm, bounded by
    the banding's collision rate exactly as in the batch cascade.

    `matched_id` is the best-estimate (tie: lowest-id) indexed doc;
    docs with no band collision come back is_dup=false with nulls.
    Reference parity: crawl4ai's URL-seen set is the exact-dup
    analogue of this check (async_url_seeder caches, deep_crawl
    visited set); content-level incremental near-dup is the curation
    extension of the same admit-only-new contract.
    """
    sig_new = minhash_signature(new_docs, text_col, id_col, num_perm, shingle_n)
    bands_new = minhash_bands(sig_new, id_col, rows_per_band)

    bn = bands_new.select(F.col(id_col).alias("_new_id"), "band", "band_key")
    if broadcast_new:
        bn = F.broadcast(bn)
    cand = (
        index_bands.select(F.col(id_col).alias("_old_id"), "band", "band_key")
        .join(bn, ["band", "band_key"])
        .filter(F.col("_old_id") != F.col("_new_id"))
        .select("_new_id", "_old_id")
        .distinct()
    )

    sn = sig_new.select(F.col(id_col).alias("_new_id"), "perm",
                        F.col("minhash").alias("_mh_new"))
    if broadcast_new:
        sn = F.broadcast(sn)
    est = (
        cand.join(sn, "_new_id")
        .join(
            index_sig.select(F.col(id_col).alias("_old_id"), "perm",
                             F.col("minhash").alias("_mh_old")),
            ["_old_id", "perm"],
        )
        .groupBy("_new_id", "_old_id")
        .agg(
            (F.sum((F.col("_mh_new") == F.col("_mh_old")).cast("int"))
             / F.lit(num_perm)).alias("est_jaccard")
        )
    )
    w = Window.partitionBy("_new_id").orderBy(
        F.desc("est_jaccard"), F.asc("_old_id")
    )
    best = (
        est.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        new_docs.select(F.col(id_col))
        .join(best.withColumnRenamed("_new_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("est_jaccard") >= threshold, F.lit(False)).alias("is_dup"),
            F.col("_old_id").alias("matched_id"),
            "est_jaccard",
        )
    )


def _mh_closure(p: int):
    # 1-arg closure per permutation: a `lambda s, p=p:` 2-param lambda
    # would silently bind Spark's HOF index argument to p instead.
    return lambda s: _minhash_fn(s, p)


def minhash_signature_arr(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", num_perm: int = 8,
                          shingle_n: int = 3) -> DataFrame:
    """(id, sig): the signature as one array<string> column, computed
    ENTIRELY per row (array_min over a transform of the shingle array
    per permutation) — zero shuffle, zero state, so it runs unchanged
    over a Structured Stream and never exchanges the shingle volume.

    Same values as `minhash_signature` (sig[p] == long-layout row p);
    prefer the long layout when downstream wants banding as a groupBy,
    this one when the pipeline must stay map-only (streams) or wants
    the signature carried on the document row."""
    sh = df.withColumn("_sh", shingles(text_col, shingle_n))
    sig = F.array(*[
        F.array_min(F.transform(F.col("_sh"), _mh_closure(p)))
        for p in range(num_perm)
    ])
    return sh.withColumn("sig", sig).drop("_sh")


def band_keys_arr(sig: Column, num_perm: int, rows_per_band: int) -> Column:
    """array<string> of band keys from an array-layout signature —
    band i concatenates the sorted minhashes of its slice, identical
    to `minhash_bands`'s collect_list+sort key."""
    n_bands = num_perm // rows_per_band
    return F.array(*[
        F.concat_ws("|", F.array_sort(F.slice(sig, i * rows_per_band + 1, rows_per_band)))
        for i in range(n_bands)
    ])


def sig_long_to_arr(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pivot a long-layout signature (id, perm, minhash) to the array
    layout (id, sig) — for probing a persisted index row-at-a-time."""
    return sig.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
            lambda x: x["minhash"],
        ).alias("sig")
    )
