"""End-to-end corpus curation report: the composition a training-data
pipeline actually runs between crawl output and tokenizer input.

One call chains the library's curation stages over a documents table:

  quality signals  →  exact dedup  →  near-dup clustering  →  keep

and emits ONE row per input document with every decision visible —
the audit artifact that makes a 100 TB curation run explainable
(why was this doc dropped? which cluster absorbed it?).

Stage shapes (all already proven individually):
- quality flags: one narrow projection (Gopher rules, C4 doc gate,
  token count) — no shuffle;
- exact dedup: one window over the 16-byte content hash;
- near-dup clustering: the minhash→LSH→Jaccard→connected-components
  cascade (candidate-bounded, isolated docs skip the iteration);
- the keep rule: canonical in BOTH dedup stages AND ≥ min_tokens.
  Gopher/C4 verdicts are REPORTED, not hard gates, so the operator
  stays corpus-agnostic (a pipeline picks its own policy downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["curation_report"]


def curation_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    shingle_n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """(id, n_tokens, ok_len, gopher_passes, c4_keep, exact_canonical,
    cluster_id, cluster_size, neardup_canonical, kept) per input doc."""
    from crawl4ai_spark.operators.clusters import dedup_clusters
    from crawl4ai_spark.operators.dedup import normalize_text
    from crawl4ai_spark.operators.repetition import c4_doc_flags, gopher_quality_flags
    from crawl4ai_spark.operators.text import ws_token_count

    flags = docs.select(
        F.col(id_col),
        ws_token_count(text_col).alias("n_tokens"),
        gopher_quality_flags(text_col)["passes"].alias("gopher_passes"),
        c4_doc_flags(text_col)["keep_doc"].alias("c4_keep"),
        F.md5(normalize_text(text_col)).alias("_chash"),
    )
    w = Window.partitionBy("_chash").orderBy(F.asc(id_col))
    exact = flags.withColumn(
        "exact_canonical", F.row_number().over(w) == 1
    ).drop("_chash")

    clusters = dedup_clusters(
        docs, text_col, id_col,
        shingle_n=shingle_n, num_perm=num_perm, bands=bands,
        rows_per_band=rows_per_band, threshold=threshold,
    ).select(
        F.col(id_col), "cluster_id", "cluster_size",
        F.col("is_canonical").alias("neardup_canonical"),
    )

    out = exact.join(clusters, id_col)
    return out.withColumn(
        "ok_len", F.col("n_tokens") >= min_tokens
    ).withColumn(
        "kept",
        F.col("ok_len") & F.col("exact_canonical") & F.col("neardup_canonical"),
    ).select(
        id_col, "n_tokens", "ok_len", "gopher_passes", "c4_keep",
        "exact_canonical", "cluster_id", "cluster_size",
        "neardup_canonical", "kept",
    )
