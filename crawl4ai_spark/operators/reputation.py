"""Host/domain reputation rollup + filtering — RefinedWeb-style
source-level curation signals.

Large-scale pipelines (RefinedWeb, Penedo et al. 2023; CCNet, Wenzek
et al. 2020; C4/Gopher URL blocklists) score entire HOSTS, not just
documents: a domain whose pages are mostly duplicates, boilerplate,
or language-inconsistent is down-weighted or dropped wholesale, which
prunes the corpus far more cheaply than per-document classification.
The reference engine's per-domain state (crawl4ai's DomainFilter and
per-host politeness stats) is the crawl-side analogue; this module is
the curation-side rollup over the crawled corpus.

Shape at scale (the part that matters at 100 TB):

- ONE hash-aggregate on the source key produces the reputation dim
  (partial aggregation map-side, so the shuffle carries one row per
  (partition, source) — combine-friendly by construction).  The only
  exact-distinct is over a fixed-width sha2 digest, never the raw
  text, so distinct-shuffle rows are 32 bytes regardless of document
  size.
- Language purity needs a per-(source, lang) count first; that
  aggregate's key is strictly finer than the final one, so Spark
  reuses the same hash-partitioning for the second agg (no extra
  wide exchange beyond the first).
- The filter joins the per-source dim BACK to the fact table with an
  explicit broadcast: #sources ~ 10^7-10^8 even at web scale (one row,
  ~60 bytes each), far under executor memory, so no fact-side shuffle
  at all — the filter is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.operators.text import quality_score

__all__ = ["source_reputation", "filter_by_source_reputation"]


def source_reputation(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    weights: tuple[float, float, float] = (0.4, 0.3, 0.3),
) -> DataFrame:
    """Per-source reputation dim:

    source, n_docs, mean_quality, dup_rate, lang_purity, mean_chars,
    reputation

    - mean_quality: mean of the composite document quality_score
    - dup_rate: 1 − distinct(text)/n_docs within the source (exact
      duplicates; distinct computed over sha2(text) so the shuffle
      ships 32-byte digests, not documents)
    - lang_purity: share of the source's docs in its majority language
    - reputation = w0·mean_quality + w1·(1−dup_rate) + w2·lang_purity
    """
    w_q, w_d, w_l = weights
    base = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(quality_score(text_col)).alias("mean_quality"),
        F.count_distinct(F.sha2(F.col(text_col), 256)).alias("n_distinct"),
        F.avg(F.length(text_col)).alias("mean_chars"),
    )
    # Majority-language share: finer-keyed count first, then a max/sum
    # rollup — the second agg's key is a prefix of the first's, so the
    # exchange from the first is reused.
    lang_counts = docs.groupBy(source_col, lang_col).agg(
        F.count(F.lit(1)).alias("n_lang")
    )
    purity = lang_counts.groupBy(source_col).agg(
        (F.max("n_lang").cast("double") / F.sum("n_lang")).alias("lang_purity")
    )
    rep = base.join(purity, source_col)
    dup_rate = 1.0 - F.col("n_distinct").cast("double") / F.col("n_docs")
    return rep.select(
        source_col,
        "n_docs",
        "mean_quality",
        dup_rate.alias("dup_rate"),
        "lang_purity",
        "mean_chars",
        (
            F.lit(w_q) * F.col("mean_quality")
            + F.lit(w_d) * (1.0 - dup_rate)
            + F.lit(w_l) * F.col("lang_purity")
        ).alias("reputation"),
    )


def filter_by_source_reputation(
    docs: DataFrame,
    min_reputation: float,
    source_col: str = "source",
    reputation: DataFrame | None = None,
    **rep_kwargs,
) -> DataFrame:
    """Keep only documents whose source's reputation ≥ min_reputation.

    The reputation dim (one row per source) is broadcast, so the fact
    table never shuffles: the gate is a map-side semi-join, the same
    plan a URL-blocklist filter compiles to.
    """
    rep = reputation if reputation is not None else source_reputation(
        docs, source_col=source_col, **rep_kwargs
    )
    dim = rep.where(F.col("reputation") >= F.lit(min_reputation)).select(
        source_col, "reputation"
    )
    return docs.join(F.broadcast(dim), source_col, "inner")
