"""Sitemap source (S3) + URL seeding pipeline (SURVEY §3.4).

Clean-room re-expression of the reference's AsyncUrlSeeder sitemap
path (/root/reference/crawl4ai/async_url_seeder.py:765-957): probe
/sitemap.xml, recurse nested <sitemapindex> levels, explode <urlset>
entries, then filter (nonsense filter F8 + glob pattern), score
(BM25 over head text, A8) and rank.

In-sandbox there is no network, so the "fetch" of a sitemap URL is a
lookup into a provided sitemaps table (url → xml body) — the same
join-shape as the page fetch.  XML parsing is stdlib ElementTree in
an Arrow UDF; recursion over index levels is a driver loop (sitemap
trees are shallow — the reference recurses too).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

SITEMAP_ENTRY = StructType([
    StructField("loc", StringType()),
    StructField("kind", StringType()),   # 'url' | 'sitemap'
])


def parse_sitemap_py(xml_body: str) -> list[dict]:
    """<urlset> → url entries; <sitemapindex> → nested sitemap refs.
    Namespace-agnostic (the reference strips namespaces too)."""
    out: list[dict] = []
    if not xml_body or not xml_body.strip():
        return out
    try:
        root = ET.fromstring(xml_body)
    except ET.ParseError:
        return out
    tag = root.tag.split("}")[-1].lower()
    child_kind = "sitemap" if tag == "sitemapindex" else "url"
    for child in root:
        for loc in child:
            if loc.tag.split("}")[-1].lower() == "loc" and loc.text:
                out.append({"loc": loc.text.strip(), "kind": child_kind})
    return out


@pandas_udf(ArrayType(SITEMAP_ENTRY))
def parse_sitemap_udf(xml_body: pd.Series) -> pd.Series:
    return pd.Series([parse_sitemap_py(x) for x in xml_body], dtype=object)


def expand_sitemaps(
    spark, sitemaps: DataFrame, roots: list[str], max_levels: int = 4
) -> DataFrame:
    """Resolve a seed list of sitemap URLs through nested indexes to
    the full URL set.  `sitemaps` is (url string, xml string).
    Returns (source_sitemap, url)."""
    frontier = spark.createDataFrame([(r,) for r in roots], "url string")
    urls_parts: list[DataFrame] = []
    for _ in range(max_levels):
        fetched = sitemaps.join(F.broadcast(frontier), "url", "left_semi")
        entries = fetched.select(
            F.col("url").alias("source_sitemap"),
            F.explode(parse_sitemap_udf(F.col("xml"))).alias("e"),
        ).select(
            "source_sitemap",
            F.col("e.loc").alias("loc"),
            F.col("e.kind").alias("kind"),
        ).localCheckpoint(eager=True)
        urls_parts.append(
            entries.filter(F.col("kind") == "url")
            .select("source_sitemap", F.col("loc").alias("url"))
        )
        nested = entries.filter(F.col("kind") == "sitemap").select(
            F.col("loc").alias("url")
        )
        if nested.isEmpty():
            break
        frontier = nested
    out = urls_parts[0]
    for p in urls_parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["url"])


def paced_probe_schedule(
    urls: DataFrame,
    *,
    hits_per_sec: int,
    window_sec: float = 1.0,
    order=None,
    queue_size: int | None = None,
    concurrency: int = 20,
) -> DataFrame:
    """P4 seeder pacing — the batch re-expression of the reference's
    global QPS control + bounded producer queue
    (/root/reference/crawl4ai/async_url_seeder.py:314-320 rate
    semaphore of `hits_per_sec` permits, :339-346 bounded queue of
    min(10000, max(1000, concurrency*100)) for backpressure).

    A semaphore is driver-side state; the Spark-native equivalent is a
    deterministic probe SCHEDULE derived in-plan: every candidate gets
    an exact global rank in producer order (with_global_rank — one
    shuffle, no partition-less window, no driver queue), and

        probe_window = (rank - 1) div (hits_per_sec * window_sec)
        queue_window = (rank - 1) div queue_size

    The probe executor consumes one `probe_window` per wall interval —
    the admitted set per window is exactly what the reference's
    semaphore would admit per second, but derived without per-row
    coordination, so it holds at 10^8 candidates.  `queue_window` is
    the bounded-queue analogue: a consumer honoring backpressure never
    materializes rows with queue_window > current+1 (one queue of
    lookahead), which bounds in-flight memory exactly like the
    asyncio.Queue(maxsize=queue_size) bound.

    Adds columns: probe_window (long), queue_window (long)."""
    from crawl4ai_spark.plans.rank import with_global_rank

    if hits_per_sec <= 0:
        # reference behavior: non-positive → rate limiting disabled
        return urls.withColumn("probe_window", F.lit(0).cast("long")).withColumn(
            "queue_window", F.lit(0).cast("long")
        )
    budget = max(1, int(hits_per_sec * window_sec))
    if queue_size is None:
        queue_size = min(10_000, max(1_000, concurrency * 100))
    if order is None:
        order = [F.col("url")]
    ranked = with_global_rank(urls, order, rank_col="_seed_rank")
    return (
        ranked.withColumn(
            "probe_window", F.expr(f"(_seed_rank - 1) div {budget}")
        )
        .withColumn("queue_window", F.expr(f"(_seed_rank - 1) div {queue_size}"))
        .drop("_seed_rank")
    )


def seed_urls_pipeline(
    spark,
    sitemaps: DataFrame,
    roots: list[str],
    *,
    query: str | None = None,
    head_texts: DataFrame | None = None,   # (url, head_text) for BM25 scoring
    pattern: str | None = None,
    max_urls: int = 10_000,
    hits_per_sec: int | None = None,
    probe_window_sec: float = 1.0,
) -> DataFrame:
    """The full seeding pipeline (async_url_seeder.urls semantics):
    sitemap expansion → nonsense filter → optional glob pattern →
    optional BM25 relevance vs `query` over head texts → rank/trim.

    hits_per_sec (P4): when set, the output additionally carries the
    deterministic probe schedule (`probe_window`, `queue_window`
    columns — see paced_probe_schedule); head probes for window w must
    not run before interval w, giving the reference's QPS bound
    without driver-side state."""
    from crawl4ai_spark.functions.bm25 import bm25_minmax, bm25_scores
    from crawl4ai_spark.functions.filters import nonsense_url_filter, url_pattern_filter

    urls = expand_sitemaps(spark, sitemaps, roots)
    urls = urls.filter(nonsense_url_filter(F.col("url")))
    if pattern:
        urls = urls.filter(url_pattern_filter(F.col("url"), pattern))
    pace_cols: list[str] = []
    if hits_per_sec is not None:
        # schedule BEFORE scoring: the probe (head fetch) is the
        # rate-limited resource and scoring consumes its output
        urls = paced_probe_schedule(
            urls, hits_per_sec=hits_per_sec, window_sec=probe_window_sec
        )
        pace_cols = ["probe_window", "queue_window"]
    if query and head_texts is not None:
        scored = bm25_scores(
            urls.join(head_texts, "url", "left")
            .withColumn("head_text", F.coalesce("head_text", F.lit(""))),
            query, text_col="head_text", id_col="url",
        )
        scored = bm25_minmax(scored)
        return (
            scored.select(
                "url", F.col("bm25_norm").alias("relevance_score"), *pace_cols
            )
            .orderBy(F.desc("relevance_score"), F.asc("url"))
            .limit(max_urls)
        )
    if query:
        # no head texts: the reference's URL-relevance fallback (R10,
        # async_url_seeder scoring when head data is absent) — rank by
        # query-vs-URL-structure similarity instead of silently
        # ignoring the query
        from crawl4ai_spark.functions.url_relevance import make_url_relevance_udf

        scored = urls.withColumn(
            "relevance_score", make_url_relevance_udf(query)(F.col("url"))
        )
        return (
            scored.select("url", "relevance_score", *pace_cols)
            .orderBy(F.desc("relevance_score"), F.asc("url"))
            .limit(max_urls)
        )
    return urls.select("url", *pace_cols).orderBy("url").limit(max_urls)
