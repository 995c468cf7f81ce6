"""Driver contract for the crawl4ai_spark engine.

`queries()` exposes one entry per implemented operator family from
SURVEY.md §2 (URL canonicalization/filter/scorer surface, frontier
admission shapes, aggregations, dedup cascade, similarity search,
text analysis, multimodal plumbing, interleaved-span docs, and the
crawl loop itself), each expressed over the driver's fixed parquet
tables; `oracle_sql()` gives the DuckDB-equivalent SQL.

Cross-engine determinism rules used throughout:
- money/quantity sums go through DECIMAL casts (exact), then cast to
  double at the end — never float-sum order dependence;
- every hash shared with the oracle is md5 (identical hex in both
  engines); xxhash64 variants exist in the library for the
  non-oracled scale path;
- float outputs are round(x, 6) in BOTH engines;
- URL test columns are synthesized deterministically from doc_id so
  the oracle can compute the expected canonical form analytically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ───────────────────────── helpers ────────────────────────────────────

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dirty_url_col() -> F.Column:
    """Deterministic dirty URL per document (Spark side).
    Mirrors the SQL in _DIRTY_URL_SQL exactly."""
    d = F.col("doc_id")
    host = F.when(d % 3 == 0, F.upper("source")).otherwise(F.col("source"))
    ext = F.when(d % 5 == 0, F.lit(".html")).when(d % 5 == 1, F.lit(".pdf")).otherwise(F.lit(""))
    q = (
        F.when(d % 7 == 0, F.lit("?utm_source=x&b=2&a=1"))
        .when(d % 7 == 1, F.lit("?a=1&b=2"))
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 11 == 0, F.lit("#frag")).otherwise(F.lit(""))
    return F.concat(
        F.lit("https://"), host, F.lit(".example.test/"), F.col("lang"), F.lit("/"),
        (F.lit(2019) + d % 6).cast("string"), F.lit("/doc-"), d.cast("string"),
        ext, q, frag,
    )


_DIRTY_URL_SQL = """
    'https://' || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
    || '.example.test/' || lang || '/' || (2019 + doc_id % 6)::VARCHAR
    || '/doc-' || doc_id::VARCHAR
    || (CASE WHEN doc_id % 5 = 0 THEN '.html' WHEN doc_id % 5 = 1 THEN '.pdf' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN '?utm_source=x&b=2&a=1'
             WHEN doc_id % 7 = 1 THEN '?a=1&b=2' ELSE '' END)
    || (CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END)
"""

# normalized text (both engines)
_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_WORDS_SQL = f"list_filter(string_split({_NORM_SQL}, ' '), x -> x != '')"


def _embedding_coverage_sql() -> str:
    """Oracle for q_embedding_coverage: the deterministic train-query
    split is computed HERE (same Python as the Spark side) and inlined
    as a VALUES list; embeddings are the sparse md5-bucket formulation;
    the query×doc product is materialized densely (LEFT JOIN) so pairs
    sharing no bucket contribute sim 0 exactly like the dense Spark
    dot product."""
    from crawl4ai_spark.operators.embedding import (
        query_variations, split_train_val,
    )

    q = "spark query window merge"
    train, _ = split_train_val(q, query_variations(q, 10))
    values = ", ".join(
        f"({i}, '{s}')" for i, s in enumerate(train)  # token-only strings
    )
    tok = "list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), t -> len(t) > 2)"
    sign = ("CASE WHEN substr(md5(t), 9, 1) IN "
            "('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END")
    return f"""
        WITH q(qid, qtext) AS (VALUES {values}),
        qt AS (SELECT qid, qtext, unnest({tok.format(col='qtext')}) AS t FROM q),
        qh AS (SELECT qid, ('0x' || substr(md5(t), 1, 8))::BIGINT % 16 AS b,
                      {sign} AS s
               FROM qt),
        qv AS (SELECT qid, b, sum(s) AS v FROM qh GROUP BY qid, b),
        qn AS (SELECT qid, sqrt(sum(v*v)) AS n FROM qv GROUP BY qid),
        dt AS (SELECT doc_id, unnest({tok.format(col='text')}) AS t FROM documents),
        dh AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT % 16 AS b,
                      {sign} AS s
               FROM dt),
        dv AS (SELECT doc_id, b, sum(s) AS v FROM dh GROUP BY doc_id, b),
        dn AS (SELECT doc_id, sqrt(sum(v*v)) AS n FROM dv GROUP BY doc_id),
        dots AS (
          SELECT qv.qid, dv.doc_id, sum(qv.v * dv.v) AS dot
          FROM qv JOIN dv ON qv.b = dv.b GROUP BY 1, 2
        ),
        pairs AS (
          SELECT q.qid, d.doc_id FROM q CROSS JOIN documents d
        ),
        sims AS (
          SELECT p.qid, p.doc_id,
                 CASE WHEN coalesce(qn.n, 0) > 0 AND coalesce(dn.n, 0) > 0
                      THEN coalesce(dots.dot, 0) / (qn.n * dn.n)
                      ELSE 0.0 END AS sim
          FROM pairs p
          LEFT JOIN dots ON dots.qid = p.qid AND dots.doc_id = p.doc_id
          LEFT JOIN qn ON qn.qid = p.qid
          LEFT JOIN dn ON dn.doc_id = p.doc_id
        ),
        best AS (SELECT qid, max(sim) AS best FROM sims GROUP BY qid)
        SELECT q.qid, q.qtext,
               round(coalesce(best.best, 0.0), 6) AS best_sim,
               round(1.0 - coalesce(best.best, 0.0), 6) AS gap
        FROM q LEFT JOIN best ON q.qid = best.qid
        ORDER BY q.qid
    """


_EMBEDDING_COVERAGE_SQL = _embedding_coverage_sql()

_EMB_TOK = ("list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), "
            "t -> len(t) > 2)")
_EMB_SIGN = ("CASE WHEN substr(md5(t), 9, 1) IN "
             "('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END")
_EMB_BUCKET = "('0x' || substr(md5(t), 1, 8))::BIGINT % 16"


def _embedding_shape_sql() -> str:
    """Oracle for q_embedding_shape: per-dim centroid/std over the
    NORMALIZED doc vectors (zero-token docs contribute zeros to every
    dim — they stay in N and in the radius max), radius via
    ||x−c||² = ||x||² − 2·x·c + ||c||² so the sparse rows suffice."""
    return f"""
        WITH dt AS (SELECT doc_id, unnest({_EMB_TOK.format(col='text')}) AS t
                    FROM documents),
        dh AS (SELECT doc_id, {_EMB_BUCKET} AS b, {_EMB_SIGN} AS s FROM dt),
        dv AS (SELECT doc_id, b, sum(s) AS v FROM dh GROUP BY doc_id, b),
        dn AS (SELECT doc_id, sqrt(sum(v*v)) AS n FROM dv GROUP BY doc_id),
        xs AS (SELECT dv.doc_id, dv.b, dv.v / dn.n AS x
               FROM dv JOIN dn USING (doc_id) WHERE dn.n > 0),
        nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
        dims AS (SELECT unnest(generate_series(0, 15)) AS i),
        sums AS (SELECT b AS i, sum(x) AS sx, sum(x*x) AS sxx
                 FROM xs GROUP BY b),
        cen AS (
          SELECT d.i,
                 coalesce(s.sx, 0) / (SELECT n FROM nn) AS center,
                 sqrt(greatest(
                   coalesce(s.sxx, 0) / (SELECT n FROM nn)
                   - (coalesce(s.sx, 0) / (SELECT n FROM nn))
                     * (coalesce(s.sx, 0) / (SELECT n FROM nn)), 0)) AS std
          FROM dims d LEFT JOIN sums s ON s.i = d.i
        ),
        c2 AS (SELECT sum(center*center) AS c2 FROM cen),
        docsums AS (
          SELECT xs.doc_id, sum(xs.x * xs.x) AS x2,
                 sum(xs.x * cen.center) AS xc
          FROM xs JOIN cen ON xs.b = cen.i GROUP BY xs.doc_id
        ),
        rad AS (
          SELECT max(sqrt(greatest(
            coalesce(ds.x2, 0) - 2*coalesce(ds.xc, 0) + (SELECT c2 FROM c2),
            0))) AS radius
          FROM documents dd LEFT JOIN docsums ds ON dd.doc_id = ds.doc_id
        )
        SELECT i, round(center, 6) AS center, round(std, 6) AS std,
               round((SELECT radius FROM rad), 6) AS radius
        FROM cen ORDER BY i
    """


def _embedding_select_sql() -> str:
    """Oracle for q_embedding_select: gap-filling link scores.  Every
    product is DENSE (LEFT JOIN onto the cross set) so pairs sharing
    no bucket contribute exactly the sim 0 the Spark dense dot
    produces."""
    from crawl4ai_spark.operators.embedding import (
        query_variations, split_train_val,
    )

    q = "spark query window merge"
    train, _ = split_train_val(q, query_variations(q, 10))
    values = ", ".join(f"({i}, '{s}')" for i, s in enumerate(train))
    return f"""
        WITH q(qid, qtext) AS (VALUES {values}),
        qt AS (SELECT qid, unnest({_EMB_TOK.format(col='qtext')}) AS t FROM q),
        qh AS (SELECT qid, {_EMB_BUCKET} AS b, {_EMB_SIGN} AS s FROM qt),
        qv AS (SELECT qid, b, sum(s) AS v FROM qh GROUP BY qid, b),
        qn AS (SELECT qid, sqrt(sum(v*v)) AS n FROM qv GROUP BY qid),
        kbd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        kt AS (SELECT doc_id, unnest({_EMB_TOK.format(col='text')}) AS t FROM kbd),
        kh AS (SELECT doc_id, {_EMB_BUCKET} AS b, {_EMB_SIGN} AS s FROM kt),
        kv AS (SELECT doc_id, b, sum(s) AS v FROM kh GROUP BY doc_id, b),
        kn AS (SELECT doc_id, sqrt(sum(v*v)) AS n FROM kv GROUP BY doc_id),
        -- gaps: 1 - best cosine of each query vs the KB (dense)
        qkdots AS (SELECT qv.qid, kv.doc_id, sum(qv.v * kv.v) AS dot
                   FROM qv JOIN kv ON qv.b = kv.b GROUP BY 1, 2),
        qksims AS (
          SELECT p.qid, p.doc_id,
                 CASE WHEN coalesce(qn.n,0) > 0 AND coalesce(kn.n,0) > 0
                      THEN coalesce(d.dot, 0) / (qn.n * kn.n)
                      ELSE 0.0 END AS sim
          FROM (SELECT q.qid, k.doc_id FROM q CROSS JOIN kbd k) p
          LEFT JOIN qkdots d ON d.qid = p.qid AND d.doc_id = p.doc_id
          LEFT JOIN qn ON qn.qid = p.qid
          LEFT JOIN kn ON kn.doc_id = p.doc_id
        ),
        gaps AS (SELECT qid, 1.0 - max(sim) AS gap FROM qksims GROUP BY qid),
        needing AS (SELECT * FROM gaps WHERE gap > 0.2),
        ncount AS (SELECT count(*)::DOUBLE AS n FROM needing),
        -- links: first-6-token preview of EVERY document
        ltok AS (
          SELECT doc_id AS href,
                 unnest(({_EMB_TOK.format(col='text')})[1:6]) AS t
          FROM documents
        ),
        lh AS (SELECT href, {_EMB_BUCKET} AS b, {_EMB_SIGN} AS s FROM ltok),
        lv AS (SELECT href, b, sum(s) AS v FROM lh GROUP BY href, b),
        ln AS (SELECT href, sqrt(sum(v*v)) AS n FROM lv GROUP BY href),
        links AS (SELECT href FROM ln WHERE n > 0),
        -- gap reduction: dense link x needing-gap product
        lqdots AS (SELECT lv.href, qv.qid, sum(lv.v * qv.v) AS dot
                   FROM lv JOIN qv ON lv.b = qv.b GROUP BY 1, 2),
        lqpairs AS (
          SELECT l.href, g.qid, g.gap,
                 1.0 - coalesce(d.dot, 0) / (ln.n * qn.n) AS newd
          FROM links l CROSS JOIN needing g
          JOIN ln ON ln.href = l.href
          JOIN qn ON qn.qid = g.qid
          LEFT JOIN lqdots d ON d.href = l.href AND d.qid = g.qid
        ),
        gapred AS (
          SELECT href,
                 sum(CASE WHEN newd < gap THEN (gap - newd) * 2.0
                          ELSE 0.0 END) / (SELECT n FROM ncount) AS gr
          FROM lqpairs GROUP BY href
        ),
        -- overlap penalty: dense link x KB max-similarity
        lkdots AS (SELECT lv.href, kv.doc_id, sum(lv.v * kv.v) AS dot
                   FROM lv JOIN kv ON lv.b = kv.b GROUP BY 1, 2),
        lksims AS (
          SELECT p.href, p.doc_id,
                 CASE WHEN coalesce(kn.n,0) > 0
                      THEN coalesce(d.dot, 0) / (ln.n * kn.n)
                      ELSE 0.0 END AS sim
          FROM (SELECT l.href, k.doc_id FROM links l CROSS JOIN kbd k) p
          JOIN ln ON ln.href = p.href
          LEFT JOIN lkdots d ON d.href = p.href AND d.doc_id = p.doc_id
          LEFT JOIN kn ON kn.doc_id = p.doc_id
        ),
        pen AS (
          SELECT href,
                 CASE WHEN max(sim) > 0.85 THEN (max(sim) - 0.85) * 2.0
                      ELSE 0.0 END AS pen
          FROM lksims GROUP BY href
        )
        SELECT l.href,
               round(coalesce(g.gr, 0) * (1.0 - coalesce(p.pen, 0)), 6)
                 AS emb_score
        FROM links l
        LEFT JOIN gapred g ON g.href = l.href
        LEFT JOIN pen p ON p.href = l.href
        ORDER BY l.href
    """


# ═════════════════════ query implementations ══════════════════════════

# ── URL surface (C1-C7, F1-F5, R1-R9 over synthesized URLs) ──────────

def q_url_canonicalize(spark, sf_dir):
    from crawl4ai_spark.functions.udfs import canonicalize_udf

    docs = _t(spark, sf_dir, "documents").withColumn("url", _dirty_url_col())
    return docs.select(
        "doc_id",
        canonicalize_udf(F.col("url"), F.col("url")).alias("canon_url"),
    ).orderBy("doc_id")


def q_url_host_depth(spark, sf_dir):
    from crawl4ai_spark.functions.scorers import extract_domain, path_depth
    from crawl4ai_spark.functions.udfs import host_udf

    docs = _t(spark, sf_dir, "documents").withColumn("url", _dirty_url_col())
    return docs.select(
        "doc_id",
        host_udf("url").alias("host"),
        extract_domain("url").alias("domain"),
        path_depth("url").cast("int").alias("depth"),
    ).orderBy("doc_id")


def q_url_pattern_filter(spark, sf_dir):
    from crawl4ai_spark.functions.filters import domain_filter, url_pattern_filter

    docs = _t(spark, sf_dir, "documents").withColumn("url", _dirty_url_col())
    return docs.select(
        "doc_id",
        url_pattern_filter("url", "*.html").alias("is_html"),
        url_pattern_filter("url", "*/2021/*").alias("in_2021"),
        domain_filter("url", allowed_domains="example.test").alias("domain_ok"),
    ).orderBy("doc_id")


def q_url_scores(spark, sf_dir):
    from crawl4ai_spark.functions.specs import compile_scorer_column

    spec = {
        "kind": "composite", "normalize": True,
        "scorers": [
            {"kind": "keyword", "keywords": ["html", "2021"]},
            {"kind": "freshness", "current_year": 2024},
            {"kind": "path_depth", "optimal_depth": 3},
        ],
    }
    docs = _t(spark, sf_dir, "documents").withColumn("url", _dirty_url_col())
    return docs.select(
        "doc_id",
        F.round(compile_scorer_column(spec, F.col("url")), 6).alias("score"),
    ).orderBy("doc_id")


def q_seen_antijoin(spark, sf_dir):
    """Seen-set membership as a left anti join on canonical URLs (J1):
    'seen' = even doc_ids; survivors must be the odd ones."""
    from crawl4ai_spark.functions.udfs import canonicalize_udf, url_hash

    docs = _t(spark, sf_dir, "documents").withColumn("url", _dirty_url_col())
    canon = docs.select(
        "doc_id", canonicalize_udf(F.col("url"), F.col("url")).alias("canon_url")
    )
    seen = canon.filter(F.col("doc_id") % 2 == 0).select("canon_url")
    # url_hash stays internal (xxhash64 is not oracle-reproducible);
    # the anti-join itself is what's under test.
    return (
        canon.join(seen, "canon_url", "left_anti")
        .withColumn("url_hash", url_hash("canon_url"))
        .select("doc_id", "canon_url")
        .orderBy("doc_id")
    )


# ── frontier-shaped relational operators (O1-O8, J1-J7, A1-A9) ───────

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: map-side partial agg → exchange on tiny key."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(14,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(14,2)") - dec("l_discount")))
             .cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_admission_topk(spark, sf_dir):
    """The politeness admission window shape (P1/O1): per-group rank
    cap, then global priority top-K — over orders as the stand-in
    frontier (customer = host, totalprice = priority)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= 2)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice", "host_rank")
    )


def q_region_revenue(spark, sf_dir):
    """Broadcast dim-join chain (J4 shape): lineitem ⨝ supplier ⨝
    nation ⨝ region, revenue per region."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    dec = lambda c: F.col(c).cast("decimal(14,2)")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(14,2)") - dec("l_discount"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n_items"))
        .orderBy("r_name")
    )


def q_brand_revenue(spark, sf_dir):
    """Promo-share-by-brand shape (TPC-H Q14 family): fact ⨝ two
    broadcast dims, conditional aggregate — closes `part` coverage."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    dec = lambda c: F.col(c).cast("decimal(14,2)")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(14,2)") - dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.sum(F.when(F.col("p_size") >= 25, rev).otherwise(F.lit(0).cast("decimal(14,2)")))
            .cast("double").alias("large_part_revenue"),
            F.countDistinct("s_suppkey").cast("int").alias("n_suppliers"),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_brand")
    )


def q_order_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey").distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def q_events_hourly(spark, sf_dir):
    """Tumbling-window aggregation over the event stream table."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,9)")).cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


def q_events_sessionize(spark, sf_dir):
    """Session windows via gap > 30 min (lag + cumulative sum) — the
    batch restatement of stateful sessionization."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = F.when(epoch - F.lag(epoch).over(w) > 1800, 1).otherwise(0)
    sess = (
        e.withColumn("new_sess", gap)
        .withColumn("session_id", F.sum("new_sess").over(w))
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(F.count("*").alias("n_events"))
    return (
        per_sess.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.max("n_events").alias("max_session_events"))
        .orderBy("user_id")
    )


def q_events_topk_users(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
    )


def q_events_props(spark, sf_dir):
    """JSON props extraction + aggregate (schema-on-read shape)."""
    e = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
        .orderBy("event_type")
    )


# ── dedup cascade (training-data pipeline) ───────────────────────────

def q_dedup_exact(spark, sf_dir):
    from crawl4ai_spark.operators.dedup import dedup_exact

    docs = _t(spark, sf_dir, "documents")
    return (
        dedup_exact(docs, "text", "doc_id")
        .select("doc_id", "content_hash", "dup_count")
        .orderBy("doc_id")
    )


def q_minhash_signatures(spark, sf_dir):
    from crawl4ai_spark.operators.dedup import minhash_signature

    docs = _t(spark, sf_dir, "documents")
    return minhash_signature(docs, "text", "doc_id", num_perm=8, shingle_n=3).orderBy(
        "doc_id", "perm"
    )


def q_lsh_pairs(spark, sf_dir):
    from crawl4ai_spark.operators.dedup import lsh_candidate_pairs, minhash_signature

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signature(docs, "text", "doc_id", num_perm=8, shingle_n=3)
    return lsh_candidate_pairs(sig, "doc_id", bands=4, rows_per_band=2).orderBy("a", "b")


def q_jaccard_pairs(spark, sf_dir):
    """The real 100 TB near-dup cascade: minhash → LSH banding →
    exact Jaccard verification on the candidate pairs only.  Work is
    bounded by |LSH candidates| × shingles/doc at every scale — the
    quadratic inverted-index self-join never happens."""
    from crawl4ai_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signature,
    )

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signature(docs, "text", "doc_id", num_perm=8, shingle_n=3)
    cand = lsh_candidate_pairs(sig, "doc_id", bands=4, rows_per_band=2)
    return (
        jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.12, candidates=cand)
        .withColumn("jaccard", F.round("jaccard", 6))
        .orderBy("a", "b")
    )


def q_jaccard_rare(spark, sf_dir):
    """Standalone rare-shingle candidate path (no LSH): pairs sharing
    ≥1 shingle with document frequency ≤ max_df.  Exercises the
    hot-shingle guard that keeps the inverted-index join sub-quadratic."""
    from crawl4ai_spark.operators.dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return (
        jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.12, max_df=60)
        .withColumn("jaccard", F.round("jaccard", 6))
        .orderBy("a", "b")
    )


def q_dedup_incremental(spark, sf_dir):
    """Incremental near-dup admission: a NEW crawl batch (doc_id % 5
    == 0, 20% of the corpus) checked against the signature index of
    everything already admitted (the other 80%) — history is never
    re-shingled, the new batch broadcasts onto the band index, and
    similarity is the MinHash signature-agreement estimator over the
    index's fixed-width rows."""
    from crawl4ai_spark.operators.dedup import (
        dedup_incremental,
        minhash_bands,
        minhash_signature,
    )

    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    index_sig = minhash_signature(old, "text", "doc_id", num_perm=8, shingle_n=3)
    index_bands = minhash_bands(index_sig, "doc_id", rows_per_band=2)
    return (
        dedup_incremental(
            new, index_sig, index_bands, "text", "doc_id",
            num_perm=8, shingle_n=3, rows_per_band=2, threshold=0.5,
        )
        .withColumn("est_jaccard", F.round("est_jaccard", 6))
        .orderBy("doc_id")
    )


def q_dedup_clusters(spark, sf_dir):
    """The dedup endgame: verified near-dup pairs grouped into
    connected components, one canonical doc per cluster.  Same cascade
    parameters as `jaccard_pairs` so the pair graph is the proven one;
    the component step is distributed min-label propagation (converges
    in diameter supersteps — near-cliques for LSH dup clusters)."""
    from crawl4ai_spark.operators.clusters import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    return dedup_clusters(
        docs, "text", "doc_id", shingle_n=3, num_perm=8, bands=4,
        rows_per_band=2, threshold=0.12,
    ).orderBy("doc_id")


def q_simhash(spark, sf_dir):
    """32-bit simhash over md5 token hashes (md5 keeps it
    oracle-reproducible; the xxhash64/64-bit variant is
    operators.dedup.simhash64)."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split(norm, " "), lambda w: w != F.lit(""))).alias("tok"),
    ).withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(32)
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(32):
        fp = fp + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("doc_id", fp.alias("simhash32")).orderBy("doc_id")


# ── similarity search over embeddings ────────────────────────────────

def q_knn_cosine(spark, sf_dir):
    from crawl4ai_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    out = cosine_topk(corpus, queries, k=5)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    ).orderBy("query_id", "rank")


def q_lsh_multiprobe(spark, sf_dir):
    """Multi-probe hyperplane LSH top-k (VERDICT r2 #7): each query
    probes its own bucket plus every hamming-distance-1 bucket, then
    exact-cosine re-ranks within the probed candidates.  md5 plane
    derivation so the oracle re-derives identical buckets (matrix
    driver-derived once via dim= — not per row)."""
    from crawl4ai_spark.operators.similarity import infer_dim, lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 8)
    out = lsh_topk(corpus, queries, k=5, n_planes=6, n_probes=7, plane_fn="md5",
                   dim=infer_dim(emb))
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    ).orderBy("query_id", "rank")


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket
    self-join candidates, exact-cosine verify, threshold cut (the
    embedding analogue of the minhash→LSH→jaccard text cascade).
    md5 plane derivation so the oracle re-derives identical buckets
    (matrix driver-derived once via dim= — not per row).
    Threshold 0.3 sits in a >=1e-3 gap of the sf0.01 cosine
    distribution, so Spark/DuckDB float noise cannot flip membership."""
    from crawl4ai_spark.operators.similarity import cosine_dup_pairs, infer_dim

    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_dup_pairs(emb, threshold=0.3, n_planes=6, plane_fn="md5",
                           dim=infer_dim(emb))
    return out.select(
        "a", "b", F.round("cos_sim", 6).alias("cos_sim")
    ).orderBy("a", "b")


def q_embedding_clusters(spark, sf_dir):
    """Near-dup clustering in embedding space: the cosine_dup_pairs
    graph (same params as `dedup_embedding`) grouped into connected
    components — proof the cluster-assembly step composes across
    modalities (text shingles AND embedding buckets)."""
    from crawl4ai_spark.operators.clusters import connected_components
    from crawl4ai_spark.operators.similarity import cosine_dup_pairs, infer_dim

    emb = _t(spark, sf_dir, "embeddings")
    pairs = cosine_dup_pairs(emb, threshold=0.3, n_planes=6, plane_fn="md5",
                             dim=infer_dim(emb))
    comp = connected_components(
        pairs.select("a", "b"), emb.select(F.col("vec_id").alias("id"))
    )
    sizes = comp.groupBy("component").agg(F.count("*").cast("int").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias("vec_id"),
            F.col("component").alias("cluster_id"),
            (F.col("id") == F.col("component")).alias("is_canonical"),
            "cluster_size",
        )
        .orderBy("vec_id")
    )


def q_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucket histogram; planes derived from md5
    so the oracle re-derives identical buckets (matrix driver-derived
    once via dim= — not per row)."""
    from crawl4ai_spark.operators.similarity import hyperplane_bucket, infer_dim

    emb = _t(spark, sf_dir, "embeddings")
    bucket = hyperplane_bucket(
        F.col("embedding"), n_planes=6, plane_fn="md5", dim=infer_dim(emb)
    )
    return (
        emb.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket").agg(F.count("*").alias("n_vecs"))
        .orderBy("bucket")
    )


def q_label_centroid_sim(spark, sf_dir):
    """TRUE per-label centroid similarity (VERDICT r3 #3 fix): the
    element-wise centroid per label is ONE groupBy agg (dim avg
    columns — map-side partial aggregation, one shuffle on label);
    the tiny (label, centroid) dim broadcasts back and each vector
    gets its exact cosine to its own label's centroid.  Linear in
    rows at any scale — replaces the grouped all-pairs self-join
    that was quadratic in a hot label's group size.  Threshold 0.415
    sits mid-gap (≥0.02 wide) of the sim distribution at both
    sf0.001 and sf0.01, so Spark/DuckDB float noise cannot flip
    membership."""
    from crawl4ai_spark.operators.similarity import cosine, infer_dim

    emb = _t(spark, sf_dir, "embeddings")
    dim = infer_dim(emb)
    cent = (
        emb.groupBy("label")
        .agg(
            *[
                F.avg(F.element_at("embedding", i + 1).cast("double")).alias(f"_c{i}")
                for i in range(dim)
            ]
        )
        .select("label", F.array(*[f"_c{i}" for i in range(dim)]).alias("centroid"))
    )
    sim = cosine(F.col("embedding"), F.col("centroid"))
    return (
        emb.join(F.broadcast(cent), "label")
        .select("label", sim.alias("sim"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("sim"), 6).alias("avg_sim"),
            F.sum(F.when(F.col("sim") >= 0.415, 1).otherwise(0)).alias("n_similar"),
        )
        .orderBy("label")
    )


def q_ivf_topk(spark, sf_dir):
    """IVF (inverted-file) approximate top-k — the data-ADAPTIVE ANN
    scale path beside the data-oblivious hyperplane LSH: coarse
    quantizer = per-label mean centroids (deterministic, re-derivable
    by the oracle — no stored model), every corpus vector assigned
    map-side to its single nearest cell, each query probes its 2
    nearest cells, exact cosine re-rank within probed cells only.
    Cell-assignment margins checked in DuckDB: min best-vs-second gap
    1.1e-4 (sf0.01) and min probe-boundary gap 7.3e-3 (sf0.001) —
    both >> double drift, so Spark/DuckDB cannot disagree on a cell."""
    from crawl4ai_spark.operators.similarity import infer_dim, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    dim = infer_dim(emb)
    cent = (
        emb.groupBy("label")
        .agg(
            *[
                F.avg(F.element_at("embedding", i + 1).cast("double")).alias(f"_c{i}")
                for i in range(dim)
            ]
        )
        .select(
            F.col("label").cast("long").alias("vec_id"),
            F.array(*[f"_c{i}" for i in range(dim)]).alias("embedding"),
        )
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 8)
    out = ivf_topk(corpus, queries, cent, k=5, n_probe=2)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    ).orderBy("query_id", "rank")


# ── text analysis ────────────────────────────────────────────────────

def q_text_stats(spark, sf_dir):
    from crawl4ai_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    stats = T.word_stats("text")
    return docs.select(
        "doc_id",
        stats["n_words"].alias("n_words"),
        stats["n_chars"].alias("n_chars"),
        F.round(stats["mean_word_len"], 6).alias("mean_word_len"),
        F.round(T.punct_ratio("text"), 6).alias("punct_ratio"),
        T.ws_token_count("text").alias("ws_tokens"),
        T.regex_token_count("text").alias("regex_tokens"),
    ).orderBy("doc_id")


def q_text_quality(spark, sf_dir):
    from crawl4ai_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(T.quality_score("text"), 6).alias("quality"),
        F.round(T.stopword_ratio("text", "en"), 6).alias("stopword_ratio_en"),
    ).orderBy("doc_id")


def q_lang_id(spark, sf_dir):
    from crawl4ai_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    pred = T.lang_id("text")
    return docs.select(
        "doc_id", "lang", pred["lang"].alias("pred_lang"), pred["hits"].alias("sw_hits")
    ).orderBy("doc_id")


def q_gopher_repetition(spark, sf_dir):
    """Gopher repetition signals (Rae et al. 2021 App. A1.1) — one
    projection of per-row sorted-array folds; zero shuffle, zero UDF."""
    from crawl4ai_spark.operators import repetition as R

    docs = _t(spark, sf_dir, "documents")
    rep = R.gopher_repetition("text")
    return docs.select(
        "doc_id",
        rep["n_lines"].alias("n_lines"),
        F.round(rep["dup_line_frac"], 6).alias("dup_line_frac"),
        F.round(rep["dup_line_char_frac"], 6).alias("dup_line_char_frac"),
        F.round(rep["top_2gram_char_frac"], 6).alias("top_2gram_char_frac"),
        F.round(rep["top_3gram_char_frac"], 6).alias("top_3gram_char_frac"),
        F.round(rep["dup_5gram_char_frac"], 6).alias("dup_5gram_char_frac"),
        F.round(rep["dup_10gram_char_frac"], 6).alias("dup_10gram_char_frac"),
    ).orderBy("doc_id")


def q_gopher_quality(spark, sf_dir):
    """Gopher document-quality rule booleans + composite pass."""
    from crawl4ai_spark.operators import repetition as R

    docs = _t(spark, sf_dir, "documents")
    q = R.gopher_quality_flags("text")
    return docs.select(
        "doc_id",
        *[q[f].alias(f) for f in (
            "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
            "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
            "ok_stop_words", "passes",
        )],
    ).orderBy("doc_id")


def q_c4_rules(spark, sf_dir):
    """C4 line+document gates (Raffel et al. 2020 §2.2)."""
    from crawl4ai_spark.operators import repetition as R

    docs = _t(spark, sf_dir, "documents")
    c4 = R.c4_doc_flags("text")
    return docs.select(
        "doc_id",
        *[c4[f].alias(f) for f in (
            "n_lines", "n_kept_lines", "n_sentences",
            "has_lorem_ipsum", "has_brace", "keep_doc",
        )],
    ).orderBy("doc_id")


def q_cross_doc_dup(spark, sf_dir):
    """Cross-document duplicated 5-gram spans (Lee et al. 2022 style):
    occurrence counts travel as 8-byte hashes; two partial-agg
    groupBys + one keyed join — linear in corpus tokens."""
    from crawl4ai_spark.operators.repetition import cross_doc_ngram_dup

    docs = _t(spark, sf_dir, "documents")
    return (
        cross_doc_ngram_dup(docs, n=5)
        .withColumn("dup_gram_char_frac", F.round("dup_gram_char_frac", 6))
        .orderBy("doc_id")
    )


def q_paragraph_dedup(spark, sf_dir):
    """Corpus-wide exact paragraph dedup: first (doc_id, pos) occurrence
    of each normalized paragraph wins; hash-keyed window, no skew."""
    from crawl4ai_spark.operators.repetition import dedup_paragraphs

    docs = _t(spark, sf_dir, "documents")
    return dedup_paragraphs(docs).orderBy("doc_id")


def q_pack_sequences(spark, sf_dir):
    """Sequence packing (per-doc assignment): sharded deterministic
    token streams cut every 512 tokens; one window per hash bucket."""
    from crawl4ai_spark.operators.packing import pack_sequences
    from crawl4ai_spark.operators.text import ws_token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", ws_token_count("text").alias("n_tokens")
    )
    return pack_sequences(docs, "doc_id", "n_tokens", seq_len=512, n_buckets=8).orderBy(
        "doc_id"
    )


def q_pack_stats(spark, sf_dir):
    """Per-sequence packing summary (docs started, token mass, fill)."""
    from crawl4ai_spark.operators.packing import pack_sequences, pack_summary
    from crawl4ai_spark.operators.text import ws_token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", ws_token_count("text").alias("n_tokens")
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", seq_len=512, n_buckets=8)
    return pack_summary(packed, seq_len=512).orderBy("seq_id")


def q_pii_redact(spark, sf_dir):
    """PII detect + redact over deterministically planted contact
    strings (the corpus itself is word soup with no PII)."""
    from crawl4ai_spark.operators.pii import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.lit("contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 or 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-1234 ok"),
    )
    docs = docs.withColumn("_suffix", planted).withColumn(
        "_full", F.concat(F.col("text"), F.lit(" "), F.col("_suffix"))
    )
    c = pii_counts(F.col("_full"))
    return docs.select(
        "doc_id",
        c["n_email"].alias("n_email"),
        c["n_ip"].alias("n_ip"),
        c["n_phone"].alias("n_phone"),
        redact_pii(F.col("_suffix")).alias("redacted_suffix"),
    ).orderBy("doc_id")


def q_vocab_coverage(spark, sf_dir):
    """Corpus vocabulary head: top-50 words, rank, cumulative coverage."""
    from crawl4ai_spark.operators.text import vocab_coverage

    docs = _t(spark, sf_dir, "documents")
    return vocab_coverage(docs, "text", top_k=50).orderBy("rank")


def q_curation_report(spark, sf_dir):
    """The full curation composition: quality flags → exact dedup →
    near-dup clusters → keep decision, one audit row per doc."""
    from crawl4ai_spark.operators.curate import curation_report

    docs = _t(spark, sf_dir, "documents")
    return curation_report(
        docs, "doc_id", "text", min_tokens=20,
        shingle_n=3, num_perm=8, bands=4, rows_per_band=2, threshold=0.12,
    ).orderBy("doc_id")


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-language sampling: hash-decided, no shuffle,
    identical output at any parallelism (unlike df.sample)."""
    from crawl4ai_spark.operators.sampling import hash_u01, stratified_sample

    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, "lang", {"en": 0.5, "de": 0.25, "fr": 0.1}, "doc_id"
    )
    return out.select(
        "doc_id", "lang", F.round(hash_u01("doc_id"), 6).alias("u01")
    ).orderBy("doc_id")


def q_mixture_weights(spark, sf_dir):
    """Temperature-alpha mixture dim (XLM-R-style n^alpha flattening
    over sources): one combine-friendly agg + a 1-row broadcast total
    — the per-group sampling-rate table for corpus re-mixing."""
    from crawl4ai_spark.operators.sampling import mixture_weights

    docs = _t(spark, sf_dir, "documents")
    return (
        mixture_weights(docs, "source", alpha=0.5, budget=200.0)
        .select(
            "source",
            "n_docs",
            F.round("nat_share", 6).alias("nat_share"),
            F.round("target_share", 6).alias("target_share"),
            F.round("rate", 6).alias("rate"),
        )
        .orderBy("source")
    )


def q_mixture_sample(spark, sf_dir):
    """The realized temperature mixture: broadcast the rate dim back,
    keep rows by their own hash — deterministic at any parallelism,
    zero corpus-side shuffle."""
    from crawl4ai_spark.operators.sampling import hash_u01, mixture_sample

    docs = _t(spark, sf_dir, "documents")
    return (
        mixture_sample(docs, "source", "doc_id", alpha=0.5, budget=200.0)
        .select("doc_id", "source", F.round(hash_u01("doc_id"), 6).alias("u01"))
        .orderBy("doc_id")
    )


def q_sample_budget(spark, sf_dir):
    """Token-budget mixing: admit docs per language in hash order until
    the stratum budget fills — one window per stratum (exact mode)."""
    from crawl4ai_spark.operators.sampling import budget_sample
    from crawl4ai_spark.operators.text import ws_token_count

    docs = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", ws_token_count("text")
    )
    out = budget_sample(
        docs, "lang", "n_tokens", {"en": 2000.0, "de": 1000.0}, "doc_id"
    )
    return out.select(
        "doc_id", "lang", "n_tokens", "cum_weight",
        F.round("_u01", 6).alias("u01"),
    ).orderBy("doc_id")


def _synth_link_edges(docs, n):
    """Deterministic IRREGULAR synthetic link graph over doc ids
    (mirrored exactly by _SYNTH_EDGES_SQL): out-degree varies 0–3 —
    docs divisible by 11 skip the main modular link (creating dangling
    vertices), docs not divisible by 3 add a second modular link, and
    every fifth doc links to one of 16 hub pages (giving the hubs high
    in-degree).  A perfectly regular graph would make PageRank/HITS
    uniform and the oracle comparison vacuous."""
    d = F.col("doc_id")
    e1 = docs.filter(d % 11 != 0).select(
        d.alias("src"), ((d * 7 + 1) % n).alias("dst")
    )
    e2 = docs.filter(d % 3 != 0).select(
        d.alias("src"), ((d * 3 + 2) % n).alias("dst")
    )
    e3 = docs.filter(d % 5 == 0).select(d.alias("src"), (d % 16).alias("dst"))
    return e1.union(e2).union(e3)


# DuckDB mirror of _synth_link_edges; expects CTEs d(doc_id) and nc(c).
_SYNTH_EDGES_SQL = """
            e AS (
              SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT c FROM nc) AS dst
              FROM d WHERE doc_id % 11 != 0
              UNION ALL
              SELECT doc_id, (doc_id * 3 + 2) % (SELECT c FROM nc)
              FROM d WHERE doc_id % 3 != 0
              UNION ALL
              SELECT doc_id, doc_id % 16 FROM d WHERE doc_id % 5 = 0
            )
"""


def q_anchor_terms(spark, sf_dir):
    """Anchor-text rollup per link target (how the web describes a
    page): in-link count, distinct sources, top-3 anchor terms — two
    keyed aggs + one dst-partitioned bounded-rank window, no global
    sort.  Anchors here are the source doc's first 3 normalized words
    over the shared deterministic edge set."""
    from crawl4ai_spark.operators.graph import anchor_text_rollup
    from crawl4ai_spark.operators.lm import word_array

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    edges = _synth_link_edges(docs.select("doc_id"), n)
    anchors = edges.join(
        docs.select(
            F.col("doc_id").alias("src"),
            F.concat_ws(" ", F.slice(word_array("text"), 1, 3)).alias("anchor"),
        ),
        "src",
    )
    return anchor_text_rollup(anchors, top_k=3).orderBy("dst", "rank")


def q_pagerank(spark, sf_dir):
    """Distributed PageRank (3 fixed power iterations, d=0.85) over the
    deterministic irregular synthetic link graph — the graph signal a
    frontier prioritizer adds on top of intrinsic URL scores."""
    from crawl4ai_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = _synth_link_edges(docs, n)
    pr = pagerank(edges, docs.select(F.col("doc_id").alias("id")), n_iter=3)
    return pr.select(
        F.col("id").alias("doc_id"), F.round("rank", 6).alias("rank")
    ).orderBy("doc_id")


def q_seed_distance(spark, sf_dir):
    """BFS hop distance from the seed list over the synthetic link
    graph (depth ≤ 4) — "how deep is this URL from the seeds", computed
    post-hoc; the oracle is a recursive CTE."""
    from crawl4ai_spark.operators.graph import bfs_levels

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = _synth_link_edges(docs, n)
    seeds = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("id")
    )
    lv = bfs_levels(edges, seeds, max_depth=4)
    return lv.select(F.col("id").alias("doc_id"), "depth").orderBy("doc_id")


def q_hits_scores(spark, sf_dir):
    """Kleinberg HITS hubs/authorities (2 fixed rounds, L1-normalized)
    over the synthetic link graph — the link-endorsement signal
    complementing PageRank for frontier prioritization."""
    from crawl4ai_spark.operators.graph import hits

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = _synth_link_edges(docs, n)
    hs = hits(edges, docs.select(F.col("doc_id").alias("id")), n_iter=2)
    return hs.select(
        F.col("id").alias("doc_id"),
        F.round("hub", 6).alias("hub"),
        F.round("auth", 6).alias("auth"),
    ).orderBy("doc_id")


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: per-document count of word 5-grams
    shared with a (deterministically chosen) eval set, and the
    contaminated flag at ≥2 overlapping grams.  The eval-set gram table
    is broadcast; the corpus side never shuffles for the probe."""
    from crawl4ai_spark.operators.decontam import decontaminate

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return (
        decontaminate(docs, bench, n=5, min_overlap=2)
        .select("doc_id", "bench_gram_hits", "contaminated")
        .orderBy("doc_id")
    )


def q_nb_lang(spark, sf_dir):
    """Classifier-based filtering (the GPT-3/LLaMA curation pillar):
    fit a multinomial Naive Bayes language classifier on the even-id
    half of the corpus, score every document.  Fit = two keyed aggs,
    predict = one token-keyed join + one (doc, class) sum; class stats
    broadcast; exactly reproducible in SQL.  (The synthetic corpus'
    lang labels are independent of its token stream, so accuracy here
    sits at the majority-class baseline by construction — the query
    pins the distributed fit/predict machinery, not model quality;
    `tests/test_classifier.py` pins the math on hand-computed
    fixtures.)"""
    from crawl4ai_spark.operators.classifier import nb_fit, nb_predict

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    train = docs.filter(F.col("doc_id") % 2 == 0).withColumnRenamed("lang", "label")
    model = nb_fit(train, label_col="label")
    return (
        nb_predict(docs, model)
        .select(
            "doc_id",
            F.col("label").alias("pred_lang"),
            F.round("score", 6).alias("score"),
        )
        .orderBy("doc_id")
    )


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style perplexity filtering (Wenzek et al. 2020): fit an
    add-k bigram LM on the English slice, score every document by
    log-perplexity under it.  The model is two vocabulary-bounded dim
    tables (broadcast); the corpus side is one explode + one doc_id
    agg — the standard post-dedup quality cut at 100 TB."""
    from crawl4ai_spark.operators.lm import fit_bigram_lm, score_log_perplexity

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    ref = docs.filter(F.col("lang") == "en")
    model, ctx, vocab = fit_bigram_lm(ref)
    return (
        score_log_perplexity(docs, model, ctx, vocab)
        .select("doc_id", "n_bigrams", F.round("log_ppl", 6).alias("log_ppl"))
        .orderBy("doc_id")
    )


def q_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail split: per-language perplexity tercile
    labels via an agg-then-broadcast cutoff dim (no window, no
    per-language sort) — the published post-LM corpus partitioning."""
    from crawl4ai_spark.operators.lm import (
        ccnet_buckets,
        fit_bigram_lm,
        score_log_perplexity,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    ref = docs.filter(F.col("lang") == "en")
    model, ctx, vocab = fit_bigram_lm(ref)
    scored = score_log_perplexity(docs, model, ctx, vocab).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return (
        ccnet_buckets(scored)
        .select("doc_id", "lang", F.round("log_ppl", 6).alias("log_ppl"), "bucket")
        .orderBy("doc_id")
    )


def q_dsir_weights(spark, sf_dir):
    """DSIR hashed n-gram importance weights (Xie et al. 2023):
    target = the English slice, raw = the whole corpus; every doc gets
    Σ_features log(p_bucket/q_bucket).  The whole model is a 512-row
    broadcast dim; scoring is one explode + broadcast join + agg."""
    from crawl4ai_spark.operators.lm import dsir_bucket_weights, dsir_log_weights

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    target = docs.filter(F.col("lang") == "en")
    w = dsir_bucket_weights(docs, target, buckets=512)
    return (
        dsir_log_weights(docs, w, buckets=512)
        .select("doc_id", "n_feats", F.round("log_weight", 6).alias("log_weight"))
        .orderBy("doc_id")
    )


def q_source_reputation(spark, sf_dir):
    """RefinedWeb-style host/domain reputation rollup: one combine-
    friendly agg on the source key (quality mean, exact-dup rate over
    sha2 digests, majority-language purity) → composite reputation."""
    from crawl4ai_spark.operators.reputation import source_reputation

    docs = _t(spark, sf_dir, "documents")
    rep = source_reputation(docs)
    return rep.select(
        "source",
        "n_docs",
        F.round("mean_quality", 6).alias("mean_quality"),
        F.round("dup_rate", 6).alias("dup_rate"),
        F.round("lang_purity", 6).alias("lang_purity"),
        F.round("mean_chars", 6).alias("mean_chars"),
        F.round("reputation", 6).alias("reputation"),
    ).orderBy("source")


def q_reputation_filter(spark, sf_dir):
    """Host-reputation gate: broadcast the per-source dim back onto the
    fact table (map-side semi-join — the fact side never shuffles)."""
    from crawl4ai_spark.operators.reputation import filter_by_source_reputation

    docs = _t(spark, sf_dir, "documents")
    kept = filter_by_source_reputation(docs, min_reputation=0.68)
    return kept.select(
        "doc_id", "source", F.round("reputation", 6).alias("reputation")
    ).orderBy("doc_id")


def q_bpe_pairs(spark, sf_dir):
    """BPE tokenizer fitting, first iteration: adjacent symbol-pair
    counts over the vocabulary-bounded word-frequency table (the one
    corpus pass is the word groupBy; the pair table is map-side
    explode + one keyed sum).  Top-50 pairs, ties lexicographic."""
    from crawl4ai_spark.operators.bpe import pair_counts, symbolize, word_freq_table

    docs = _t(spark, sf_dir, "documents")
    wf = word_freq_table(docs, "text").withColumn("syms", symbolize("word"))
    return (
        pair_counts(wf)
        .orderBy(F.desc("count"), F.asc("a"), F.asc("b"))
        .limit(50)
    )


def q_hash_embed(spark, sf_dir):
    """Deterministic hash-trick text embedding (the EmbeddingStrategy
    model seam, operators/embedding.hash_embed — reference
    adaptive_crawler.py:612-621 calls an external model; here bucket/
    sign derive from md5(token) so the oracle re-derives identical
    vectors).  Pure per-row Catalyst fold: no shuffle, no UDF."""
    from crawl4ai_spark.operators.embedding import hash_embed

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.transform(hash_embed(F.col("text"), 16),
                    lambda x: F.round(x, 6)).alias("embedding"),
    ).orderBy("doc_id")


def q_embedding_coverage(spark, sf_dir):
    """EmbeddingStrategy coverage metric (adaptive_crawler.py:927-946:
    best cosine per query point vs the knowledge base; gap = 1 − best,
    :774-802) with `documents` as the KB and the deterministic
    query-variation train split as the semantic space.  Plan: KB scan
    × broadcast(13 query rows) aggregated map-side — the KB never
    shuffles; at 100 TB the same shape holds (tiny probe × huge
    corpus)."""
    from crawl4ai_spark.operators.embedding import (
        _query_df, coverage_gaps, hash_embed, query_variations, split_train_val,
    )

    q = "spark query window merge"
    train, _ = split_train_val(q, query_variations(q, 10))
    qdf = _query_df(spark, train, 16)
    docs = _t(spark, sf_dir, "documents")
    kb = docs.select(hash_embed(F.col("text"), 16).alias("vec"))
    gaps = coverage_gaps(kb, qdf)
    return (
        qdf.join(gaps, "qid")
        .select(
            "qid", "qtext",
            F.round(F.lit(1.0) - F.col("gap"), 6).alias("best_sim"),
            F.round("gap", 6).alias("gap"),
        )
        .orderBy("qid")
    )


def q_embedding_shape(spark, sf_dir):
    """Coverage-shape model (adaptive_crawler.py:737-758: centroid +
    per-dim std + max radius — the reference's high-dim alpha-shape
    stand-in) over the documents corpus's hash embeddings.  One
    posexplode agg keyed by dim + a broadcast-back radius pass."""
    from crawl4ai_spark.operators.embedding import coverage_shape, hash_embed

    docs = _t(spark, sf_dir, "documents")
    vecs = docs.select(hash_embed(F.col("text"), 16).alias("vec"))
    return coverage_shape(vecs).select(
        "i",
        F.round("center", 6).alias("center"),
        F.round("std", 6).alias("std"),
        F.round("radius", 6).alias("radius"),
    ).orderBy("i")


def q_embedding_select(spark, sf_dir):
    """Gap-filling link selection (adaptive_crawler.py:804-925): links
    are each document's first-6-token preview, the KB is every 10th
    document, gaps come from the deterministic train-query split; score
    = ×2-amplified mean improvement over uncovered gaps × (1 − overlap
    penalty).  Plan: two broadcast products (links × gaps, links × KB)
    aggregated map-side — the link table never shuffles against the
    corpus."""
    from crawl4ai_spark.operators.embedding import (
        _adaptive_tokens, _query_df, coverage_gaps, hash_embed,
        query_variations, select_links, split_train_val,
    )

    q = "spark query window merge"
    train, _ = split_train_val(q, query_variations(q, 10))
    qdf = _query_df(spark, train, 16)
    docs = _t(spark, sf_dir, "documents")
    kb = docs.filter(F.col("doc_id") % 10 == 0).select(
        hash_embed(F.col("text"), 16).alias("vec")
    )
    gaps = coverage_gaps(kb, qdf)
    gaps_q = qdf.join(gaps, "qid").select("qid", "qvec", "gap")
    links = docs.select(
        F.col("doc_id").alias("href"),
        F.array_join(F.slice(_adaptive_tokens(F.col("text")), 1, 6), " ")
        .alias("link_text"),
        F.col("doc_id").alias("seq"),
    ).withColumn("lvec", hash_embed("link_text", 16)).filter(
        F.exists(F.col("lvec"), lambda x: x != 0)
    )
    scored = select_links(links, gaps_q, kb, vec_col="vec", link_vec_col="lvec")
    return scored.select(
        "href", F.round("emb_score", 6).alias("emb_score")
    ).orderBy("href")


def q_quality_quantiles(spark, sf_dir):
    """Per-language quality distribution (exact interpolated
    percentiles — the corpus-health dashboard numbers; at 100 TB the
    same query swaps percentile → percentile_approx, same plan shape)."""
    from crawl4ai_spark.operators.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    q = docs.select("lang", quality_score("text").alias("q"))
    return (
        q.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.percentile("q", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("q", F.lit(0.9)), 6).alias("p90"),
            F.round(F.avg("q"), 6).alias("mean_q"),
        )
        .orderBy("lang")
    )


# ── multimodal plumbing ──────────────────────────────────────────────

def q_media_decode(spark, sf_dir):
    """Binary media column → fake-decode features via mapInPandas (the
    Spark plumbing is real; the codec is the deterministic md5 stand-in)."""
    from crawl4ai_spark.operators.multimodal import extract_image_features

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.encode("text", "UTF-8").alias("blob"),
    )
    out = extract_image_features(media, fake=True)
    return out.select(
        "media_id", "width", "height", "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 16), 6).alias("f15"),
    ).orderBy("media_id")


def q_video_frames(spark, sf_dir):
    """Frame-sampling plumbing: deterministic frame indices per blob."""
    docs = _t(spark, sf_dir, "documents")
    n_frames = (F.length("text") / F.lit(50)).cast("int") + 1
    return docs.select(
        F.col("doc_id"),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(3))).alias("frame_idx"),
    ).orderBy("doc_id", "frame_idx")


def q_pdf_extract(spark, sf_dir):
    """PDF processor (extraction/pdf, reference processors/pdf):
    documents → one-page PDFs via the subset writer (FlateDecode
    streams, xref, Info dict) → distributed parse back → per-page
    digests the oracle recomputes from the plain table.  Pins the
    writer/reader pair byte-exactly (escapes, unicode, streams)."""
    from crawl4ai_spark.extraction.pdf import build_simple_pdf, pdf_extract_pages

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches):
        import pandas as pd

        for pdf_b in batches:
            rows = [
                {"doc_id": did, "pdf": build_simple_pdf([str(text)])}
                for did, text in zip(pdf_b["doc_id"], pdf_b["text"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "pdf"])

    blobs = docs.mapInPandas(gen, "doc_id long, pdf binary")
    pages = pdf_extract_pages(blobs)
    return pages.select(
        "doc_id",
        "page_number",
        F.col("n_chars"),
        F.md5(F.encode("raw_text", "UTF-8")).alias("raw_md5"),
    ).orderBy("doc_id")


def q_revisit_priority(spark, sf_dir):
    """Freshness-driven recrawl ranking (plans.recrawl
    change_rate_priority — Cho & Garcia-Molina change-rate estimator):
    events stand in for a fetch history (user_id = page, value bucket
    = content signature); staleness = P(changed since last fetch)."""
    from crawl4ai_spark.plans.recrawl import change_rate_priority

    ev = _t(spark, sf_dir, "events")
    hist = ev.select(
        F.col("user_id").alias("page_id"),
        "ts",
        "event_id",
        F.floor(F.col("value") / F.lit(50)).cast("long").alias("content_sig"),
    )
    out = change_rate_priority(
        hist, "page_id", "ts", "content_sig", tiebreak_col="event_id"
    )
    return out.select(
        "page_id", "n_obs", "n_changes",
        F.round(F.col("change_rate") * F.lit(1e6), 6).alias("rate_e6"),
        F.round("staleness", 6).alias("staleness"),
    ).orderBy("page_id")


def q_warc_roundtrip(spark, sf_dir):
    """WARC source (sources/warc): build Common-Crawl-layout archives
    (one gzip member per record) from the documents table, parse them
    back through the distributed record parser, and emit byte-level
    digests the oracle recomputes from the plain table — pinning the
    framing, member-gzip, and HTTP-unwrap paths end to end."""
    from crawl4ai_spark.sources.warc import parse_warc, to_warc_members

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("http://docs.test/"), F.col("doc_id").cast("string")).alias("url"),
        F.col("text").alias("payload"),
    )
    blobs = to_warc_members(docs, id_col="doc_id")
    return parse_warc(blobs).select(
        F.col("source").cast("bigint").alias("doc_id"),
        "url",
        F.col("payload_length").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    ).orderBy("doc_id")


# ── interleaved text+media span documents (the north-rule shape) ─────

def q_interleaved_spans(spark, sf_dir):
    """documents → docs(doc_id, spans) with a media span injected after
    every 3rd 10-word text chunk, then exploded for value checking."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    words = F.filter(F.split(norm, " "), lambda w: w != F.lit(""))
    n_chunks = F.ceil(F.size(words) / F.lit(10)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.concat_ws(" ", F.slice(words, j * 10 + 1, 10)),
    )
    # after chunks 2, 5, 8… (0-based j%3==2) insert a media span
    spans = F.flatten(
        F.transform(
            chunks,
            lambda c, j: F.when(
                j % 3 == 2,
                F.array(
                    F.struct(F.lit("text").alias("kind"), c.alias("text"), F.lit("").alias("media_ref")),
                    F.struct(
                        F.lit("media").alias("kind"), F.lit("").alias("text"),
                        F.concat(F.lit("/img/"), F.col("doc_id").cast("string"),
                                 F.lit("-"), j.cast("string")).alias("media_ref"),
                    ),
                ),
            ).otherwise(
                F.array(F.struct(F.lit("text").alias("kind"), c.alias("text"), F.lit("").alias("media_ref")))
            ),
        )
    )
    exploded = docs.select("doc_id", F.posexplode(spans).alias("offset", "s"))
    return exploded.select(
        "doc_id", "offset",
        F.col("s.kind").alias("kind"),
        F.col("s.media_ref").alias("media_ref"),
        F.length(F.col("s.text")).alias("text_len"),
    ).orderBy("doc_id", "offset")


def _interleaved_table(spark, sf_dir):
    """documents → the engine's native payload shape (input_hint):
    (doc_id, spans: array<struct<kind,text,media_ref,offset>>), with a
    media span after every 3rd 10-word chunk.  Media refs are keyed by
    doc_id % 50 so assets are SHARED across documents (realistic for
    manifest/dedup shapes)."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    words = F.filter(F.split(norm, " "), lambda w: w != F.lit(""))
    n_chunks = F.ceil(F.size(words) / F.lit(10)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.concat_ws(" ", F.slice(words, j * 10 + 1, 10)),
    )
    bare = F.flatten(
        F.transform(
            chunks,
            lambda c, j: F.when(
                j % 3 == 2,
                F.array(
                    F.struct(F.lit("text").alias("kind"), c.alias("text"),
                             F.lit("").alias("media_ref")),
                    F.struct(
                        F.lit("media").alias("kind"), F.lit("").alias("text"),
                        F.concat(F.lit("/img/"), (F.col("doc_id") % 50).cast("string"),
                                 F.lit("-"), j.cast("string")).alias("media_ref"),
                    ),
                ),
            ).otherwise(
                F.array(F.struct(F.lit("text").alias("kind"), c.alias("text"),
                                 F.lit("").alias("media_ref")))
            ),
        )
    )
    spans = F.transform(
        bare,
        lambda s, i: F.struct(
            s["kind"].alias("kind"), s["text"].alias("text"),
            s["media_ref"].alias("media_ref"), i.cast("int").alias("offset"),
        ),
    )
    return docs.select("doc_id", spans.alias("spans"))


def q_render_training(spark, sf_dir):
    """Interleaved span docs → one training string per doc with
    <|image|> placeholders + media refs in placeholder order."""
    from crawl4ai_spark.operators.interleaved import render_for_training

    docs = _interleaved_table(spark, sf_dir)
    r = render_for_training("spans")
    return docs.select(
        "doc_id", r["text"].alias("training_text"), r["media_refs"].alias("media_refs")
    ).orderBy("doc_id")


def q_span_integrity(spark, sf_dir):
    """Span-document data-quality gate over the interleaved table."""
    from crawl4ai_spark.operators.interleaved import span_integrity

    docs = _interleaved_table(spark, sf_dir)
    s = span_integrity("spans")
    return docs.select(
        "doc_id",
        *[s[f].alias(f) for f in ("n_spans", "n_text", "n_media", "text_chars", "offsets_ok")],
    ).orderBy("doc_id")


def q_media_manifest(spark, sf_dir):
    """Corpus-wide media-asset manifest: shared refs aggregate across
    documents (the fetch/embed-each-asset-once join key)."""
    from crawl4ai_spark.operators.interleaved import media_manifest

    docs = _interleaved_table(spark, sf_dir)
    return media_manifest(docs).orderBy("media_ref")


# ── extended extraction surface (E9/E10/E12, A6, A8, S3) ─────────────

def q_regex_entities(spark, sf_dir):
    """Labeled regex entity extraction (E12) over document text."""
    from crawl4ai_spark.extraction.regex_extract import regex_extract

    docs = _t(spark, sf_dir, "documents")
    # synthesize entity-bearing text deterministically so matches exist
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact u"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.org price $"), (F.col("doc_id") % 90 + 10).cast("string"),
            F.lit(".50 up "), (F.col("doc_id") % 100).cast("string"), F.lit("% on 2024-0"),
            (F.col("doc_id") % 9 + 1).cast("string"), F.lit("-17"),
        ).alias("text"),
    )
    out = regex_extract(enriched, labels=["email", "currency", "percentage", "date_iso"])
    return out.groupBy("label").agg(F.count("*").alias("n_matches")).orderBy("label")


def q_window_chunks(spark, sf_dir):
    """Sliding-window chunking with overlap (E10): chunk rows per doc."""
    from crawl4ai_spark.extraction.chunking import explode_chunks, window_chunks

    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    out = explode_chunks(
        docs.withColumn("text", norm), window_chunks("text", 20, 5)
    )
    return out.select(
        "doc_id", "chunk_idx",
        F.length("chunk").alias("chunk_len"),
    ).orderBy("doc_id", "chunk_idx")


def q_table_extract(spark, sf_dir):
    """Structured table extraction (E9) from synthesized page HTML."""
    from crawl4ai_spark.extraction.tables import tables_from_pages

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body><table><caption>doc</caption>"
              "<tr><th>key</th><th>value</th></tr>"
              "<tr><td>id</td><td>"), F.col("doc_id").cast("string"),
        F.lit("</td></tr><tr><td>lang</td><td>"), F.col("lang"),
        F.lit("</td></tr></table></body></html>"),
    )
    pages = docs.select(F.col("doc_id").cast("string").alias("url"), html.alias("html"))
    out = tables_from_pages(pages)
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.element_at("headers", 2).alias("h2"),
        F.element_at(F.element_at("rows", 1), 2).alias("id_cell"),
        F.element_at(F.element_at("rows", 2), 2).alias("lang_cell"),
        "score",
    ).orderBy("doc_id")


def q_bm25_rank(spark, sf_dir):
    """Corpus BM25 relevance (A8/F6): score every document against a
    fixed query, min-max normalized, top 50."""
    from crawl4ai_spark.functions.bm25 import bm25_minmax, bm25_scores

    docs = _t(spark, sf_dir, "documents")
    scored = bm25_minmax(bm25_scores(docs, "spark window batch"))
    return (
        scored.select("doc_id", F.round("bm25_norm", 6).alias("relevance"))
        .orderBy(F.desc("relevance"), F.asc("doc_id"))
        .limit(50)
    )


def q_term_stats(spark, sf_dir):
    """Corpus term/document frequencies (A6) for the top-30 terms."""
    from crawl4ai_spark.operators.adaptive import term_stats

    docs = _t(spark, sf_dir, "documents")
    return term_stats(docs).orderBy(F.desc("tf"), F.asc("term")).limit(30)


def q_adaptive_rank(spark, sf_dir):
    """R11 — adaptive frontier rank (relevance + novelty + authority,
    reference adaptive_crawler.py:391-503): KB = every 4th document's
    term set; the rest are 'links' whose preview text is ranked by
    expected information gain, with the URL-structure authority
    heuristic exercised across its branches."""
    from crawl4ai_spark.operators.adaptive import adaptive_rank

    docs = _t(spark, sf_dir, "documents")
    kb = docs.filter(F.col("doc_id") % 4 == 0)
    d = F.col("doc_id").cast("string")
    path = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("/docs/guide/item-"), d))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("/api/item-"), d))
        .otherwise(F.concat(F.lit("/blog/item-"), d, F.lit(".png")))
    )
    links = docs.filter(F.col("doc_id") % 4 != 0).withColumn(
        "url", F.concat(F.lit("https://"), F.col("source"), F.lit(".example.test"), path)
    )
    ranked = adaptive_rank(
        links, kb, "spark shuffle join window frontier",
        authority="url", url_col="url",
    )
    return ranked.select(
        "doc_id",
        F.round("relevance", 6).alias("relevance"),
        F.round("novelty", 6).alias("novelty"),
        F.round("authority", 6).alias("authority"),
        F.round("adaptive_score", 6).alias("adaptive_score"),
    ).orderBy("doc_id")


def q_sitemap_seed(spark, sf_dir):
    """Sitemap seeding pipeline (S3): synthesized per-source sitemap
    XML → index expansion → nonsense filter → per-source URL counts."""
    from crawl4ai_spark.sources.sitemap import seed_urls_pipeline

    docs = _t(spark, sf_dir, "documents")
    # leaf sitemaps: one per source, listing that source's doc URLs
    leaf = docs.groupBy("source").agg(
        F.concat(
            F.lit("<urlset>"),
            F.concat_ws(
                "",
                F.array_sort(F.collect_list(
                    F.concat(F.lit("<url><loc>https://"), F.col("source"),
                             F.lit(".example.test/docs/item-"),
                             F.col("doc_id").cast("string"),
                             F.lit("</loc></url>"))
                )),
            ),
            F.lit("</urlset>"),
        ).alias("xml"),
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.test/sitemap.xml")).alias("url"),
    ).select("url", "xml")
    roots = [r["url"] for r in leaf.select("url").collect()]
    urls = seed_urls_pipeline(spark, leaf, sorted(roots), max_urls=1_000_000)
    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    return urls.groupBy(host.alias("host")).agg(F.count("*").alias("n_urls")).orderBy("host")


def q_head_parse(spark, sf_dir):
    """Partial-<head> parsing (E15) over synthesized page heads."""
    from crawl4ai_spark.extraction.headparse import parse_head_udf

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html lang="'), F.col("lang"), F.lit('"><head><title>Doc '),
        F.col("doc_id").cast("string"),
        F.lit('</title><meta name="description" content="about '),
        F.col("source"), F.lit('"></head><body>ignored</body></html>'),
    )
    out = docs.select("doc_id", parse_head_udf(html).alias("h"))
    return out.select(
        "doc_id",
        F.col("h.title").alias("title"),
        F.col("h.lang").alias("html_lang"),
        F.element_at(F.col("h.meta"), "description").alias("description"),
    ).orderBy("doc_id")


def q_fit_markdown(spark, sf_dir):
    """Pruning content filter (E5): boilerplate nav dropped, the
    content paragraph survives verbatim (whitespace-normalized)."""
    from crawl4ai_spark.extraction.pruning import make_fit_markdown_udf

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body><nav class="nav-menu"><a href="/">home</a>'
              '<a href="/about">about</a></nav><p>'),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    fit = make_fit_markdown_udf()
    out = docs.select(
        "doc_id",
        fit(F.col("doc_id").cast("string"), html).alias("fit_md"),
    )
    return out.select(
        "doc_id",
        F.length("fit_md").alias("fit_len"),
        (F.instr("fit_md", "home") > 0).alias("has_nav_leak"),
    ).orderBy("doc_id")


def q_bm25_fit(spark, sf_dir):
    """BM25 content filter (E6) through the Spark Arrow UDF
    (content_filter_strategy.py:381-530 semantics): a two-chunk page
    per document — a kept chunk carrying the user-query tokens plus
    doc-varying text, and a noise chunk (the document body, sanitized)
    that contains zero query tokens and therefore BM25-scores exactly
    0 < threshold. Deterministic: kept set is always exactly the first
    chunk, so the oracle can state fit_html/fit_markdown in SQL."""
    from crawl4ai_spark.extraction.fit import make_bm25_fit_udf

    docs = _t(spark, sf_dir, "documents")
    noise = F.substring(F.regexp_replace("text", r"[<>&]", " "), 1, 400)
    html = F.concat(
        F.lit("<html><body><p>zzfrontierzz zzcrawlzz doc "),
        F.col("doc_id").cast("string"), F.lit(" from "), F.col("source"),
        F.lit("</p><p>"), noise, F.lit("</p></body></html>"),
    )
    udf = make_bm25_fit_udf(user_query="zzfrontierzz zzcrawlzz", threshold=0.01)
    out = docs.select("doc_id", udf(F.col("doc_id").cast("string"), html).alias("f"))
    return out.select(
        "doc_id",
        F.col("f.fit_html").alias("fit_html"),
        F.regexp_replace(F.col("f.fit_markdown"), r"\s+$", "").alias("fit_md"),
    ).orderBy("doc_id")


def q_css_extract(spark, sf_dir):
    """JSON-CSS schema extraction (E11): deterministic HTML built from
    the documents columns, extracted with a {baseSelector, fields[]}
    schema (attribute/text/transform/regex field types, child
    combinator), round-tripping back to the source columns.
    Reference semantics: extraction_strategy.py:804-1242."""
    from crawl4ai_spark.extraction.css_schema import css_extract

    docs = _t(spark, sf_dir, "documents")
    body_src = F.substring(
        F.regexp_replace("text", r'[<>&"\s]+', " "), 1, 120
    )
    html = F.concat(
        F.lit('<article class="doc" data-id="'), F.col("doc_id").cast("string"),
        F.lit('"><h2 class="title">Doc '), F.col("doc_id").cast("string"),
        F.lit('</h2><span class="lang">'), F.col("lang"),
        F.lit('</span><div class="body"><p>'), body_src,
        F.lit('</p></div><a class="src" href="https://ex.test/'), F.col("source"),
        F.lit("/"), F.col("doc_id").cast("string"), F.lit('">src</a></article>'),
    )
    schema = {
        "baseSelector": "article.doc",
        "baseFields": [{"name": "pid", "type": "attribute", "attribute": "data-id"}],
        "fields": [
            {"name": "title", "type": "text", "selector": "h2.title"},
            {"name": "lang_lc", "type": "text", "selector": "span.lang",
             "transform": "lowercase"},
            {"name": "body", "type": "text", "selector": "div.body > p"},
            {"name": "href", "type": "attribute", "selector": "a.src",
             "attribute": "href"},
            {"name": "num", "type": "regex", "selector": "h2.title",
             "pattern": r"Doc (\d+)"},
        ],
    }
    pages = docs.select("doc_id", html.alias("html"))
    out = css_extract(pages, schema, "html", "items")
    return (
        out.select(F.explode("items").alias("it"))
        .select(
            F.col("it.pid").alias("pid"),
            F.col("it.title").alias("title"),
            F.col("it.lang_lc").alias("lang_lc"),
            F.col("it.body").alias("body"),
            F.col("it.href").alias("href"),
            F.col("it.num").alias("num"),
        )
        .orderBy(F.col("pid").cast("long"))
    )


# ── link scoring / SEO / relevance (R7, R9, F6, F7) ──────────────────
#
# Deterministic variants per doc_id: the Spark queries score
# synthesized link/head fields natively; the oracles embed the
# expected value per variant, computed by the golden-tested Python
# mirrors (functions.link_scores / functions.seo_filters) — so the
# gate checks the Column implementations end-to-end against the
# pinned reference semantics.

_LS_PAGE = ("Spark Frontier Guide", "Crawling at scale", "A guide to crawling")
_LS_VARIANTS = [
    ("Read the API reference", "https://docs.example.com/docs/api",
     "API docs page", "nav-primary", ""),
    ("click here", "http://example.com/track/x/y/z/w/v/u",
     "", "ad-banner promo", "nofollow"),
    ("Spark crawling guide for scale", "https://example.com/blog/spark",
     "", "", "next"),
    ("here", "https://example.com/login/", "", "", ""),
]


def _ls_expected() -> list[float]:
    from crawl4ai_spark.functions.link_scores import (
        _tokens_py, link_intrinsic_score_py,
    )

    terms = _tokens_py(" ".join(_LS_PAGE))
    out = []
    for text, url, ta, ca, ra in _LS_VARIANTS:
        docs_site = url.startswith("https://docs.") or "://api." in url
        out.append(round(link_intrinsic_score_py(text, url, ta, ca, ra, terms, docs_site), 6))
    return out


def q_link_scores(spark, sf_dir):
    """Link intrinsic + total scoring (R7/R9, utils.py:3143-3304):
    native Columns over per-doc link variants; contextual score
    synthesized, blended 0.7/0.3."""
    from crawl4ai_spark.functions.link_scores import (
        is_docs_site, link_intrinsic_score, link_total_score, page_terms,
    )

    docs = _t(spark, sf_dir, "documents")
    v = F.col("doc_id") % 4
    pick = lambda i: [F.lit(_LS_VARIANTS[j][i]) for j in range(4)]  # noqa: E731
    choose = lambda i: (  # noqa: E731
        F.when(v == 0, pick(i)[0]).when(v == 1, pick(i)[1])
        .when(v == 2, pick(i)[2]).otherwise(pick(i)[3])
    )
    d = docs.select(
        "doc_id",
        choose(0).alias("text"), choose(1).alias("url"),
        choose(2).alias("title_attr"), choose(3).alias("class_attr"),
        choose(4).alias("rel_attr"),
        F.lit(_LS_PAGE[0]).alias("page_title"),
        F.lit(_LS_PAGE[1]).alias("headlines"),
        F.lit(_LS_PAGE[2]).alias("meta_description"),
        ((F.col("doc_id") % 10) / 10.0).alias("contextual"),
    )
    terms = page_terms(F.col("page_title"), F.col("headlines"), F.col("meta_description"))
    intrinsic = link_intrinsic_score(
        F.col("text"), F.col("url"), F.col("title_attr"),
        F.col("class_attr"), F.col("rel_attr"), terms, is_docs_site(F.col("url")),
    )
    # blend from the ROUNDED intrinsic so the oracle's embedded
    # 6-decimal constants reproduce the arithmetic bit-for-bit
    ri = F.round(intrinsic, 6)
    return d.select(
        "doc_id",
        ri.alias("intrinsic"),
        F.round(
            link_total_score(ri, F.col("contextual"), True, True), 6
        ).alias("total"),
    ).orderBy("doc_id")


_SEO_VARIANTS = [
    # (title, description, robots, has_schema, path_suffix)
    ("A title that is exactly fifty two characters long ok", "d" * 150, "index", True, "canon"),
    ("Cricket", "short", "noindex", False, "cricket_rules?ref=1"),
    ("Mid-length title over forty characters okay", "m" * 125, "", False, "blog/2024/post"),
]


def _seo_expected() -> list[float]:
    from crawl4ai_spark.functions.seo_filters import seo_score_py

    out = []
    for title, desc, robots, schema, suffix in _SEO_VARIANTS:
        url = f"https://example.com/{suffix.split('?')[0]}" + (
            "?" + suffix.split("?")[1] if "?" in suffix else ""
        )
        meta = {"description": desc, "robots": robots}
        html = '<head><script type="application/ld+json">{}</script></head>' if schema else "<head></head>"
        out.append(round(seo_score_py(url, title, meta, html, keywords=["title", "cricket"]), 6))
    return out


def q_seo_score(spark, sf_dir):
    """SEOFilter quality score (F7, filters.py:576-687) over per-doc
    head variants."""
    from crawl4ai_spark.functions.seo_filters import seo_score

    docs = _t(spark, sf_dir, "documents")
    v = F.col("doc_id") % 3
    rows = _SEO_VARIANTS

    def choose(i):
        return (
            F.when(v == 0, F.lit(rows[0][i])).when(v == 1, F.lit(rows[1][i]))
            .otherwise(F.lit(rows[2][i]))
        )

    url = F.concat(
        F.lit("https://example.com/"),
        F.when(v == 0, F.lit("canon")).when(v == 1, F.lit("cricket_rules?ref=1"))
        .otherwise(F.lit("blog/2024/post")),
    )
    head_html = F.when(
        choose(3), F.lit('<head><script type="application/ld+json">{}</script></head>')
    ).otherwise(F.lit("<head></head>"))
    meta = F.map_from_arrays(
        F.array(F.lit("description"), F.lit("robots")),
        F.array(choose(1), choose(2)),
    )
    d = docs.select("doc_id", url.alias("url"), choose(0).alias("title"),
                    meta.alias("meta"), head_html.alias("head_html"))
    return d.select(
        "doc_id",
        F.round(
            seo_score(F.col("url"), F.col("title"), F.col("meta"),
                      F.col("head_html"), keywords=["title", "cricket"]),
            6,
        ).alias("seo"),
    ).orderBy("doc_id")


_REL_QUERY = "causes of american civil war"
_REL_VARIANTS = [
    ("American Civil War history and causes",
     "The causes of the American civil war explained for students of history."),
    ("Cricket", "bat and ball games history"),
    ("Randomness", "entropy and chance"),
]


def _rel_expected() -> list[float]:
    from crawl4ai_spark.functions.seo_filters import content_relevance_score_py

    return [
        round(content_relevance_score_py(t, {"description": d}, _REL_QUERY), 6)
        for t, d in _REL_VARIANTS
    ]


def q_relevance_score(spark, sf_dir):
    """ContentRelevanceFilter BM25 head score (F6, filters.py:501-573)."""
    from crawl4ai_spark.functions.seo_filters import content_relevance_score

    docs = _t(spark, sf_dir, "documents")
    v = F.col("doc_id") % 3
    title = (
        F.when(v == 0, F.lit(_REL_VARIANTS[0][0]))
        .when(v == 1, F.lit(_REL_VARIANTS[1][0]))
        .otherwise(F.lit(_REL_VARIANTS[2][0]))
    )
    desc = (
        F.when(v == 0, F.lit(_REL_VARIANTS[0][1]))
        .when(v == 1, F.lit(_REL_VARIANTS[1][1]))
        .otherwise(F.lit(_REL_VARIANTS[2][1]))
    )
    meta = F.map_from_arrays(F.array(F.lit("description")), F.array(desc))
    return docs.select(
        "doc_id",
        F.round(content_relevance_score(title, meta, _REL_QUERY), 6).alias("rel"),
    ).orderBy("doc_id")


def q_filter_stats(spark, sf_dir):
    """FilterStats (A1): one-pass per-filter pass/reject counts over
    the dirty URL corpus (filters.py:18-66)."""
    from crawl4ai_spark.operators.stats import filter_stats

    docs = _t(spark, sf_dir, "documents").select(_dirty_url_col().alias("url"))
    specs = [
        {"kind": "pattern", "name": "en_pages", "patterns": ["*.example.test/en/*"]},
        {"kind": "pattern", "name": "typed_docs", "patterns": ["*.html*", "*.pdf*"]},
    ]
    return filter_stats(docs, specs, "url").orderBy("filter")


def q_scoring_stats(spark, sf_dir):
    """ScoringStats (A2, scorers.py:26-60)."""
    from crawl4ai_spark.operators.stats import scoring_stats

    docs = _t(spark, sf_dir, "documents").select(
        ((F.col("doc_id") % 100) / 100.0).alias("score")
    )
    out = scoring_stats(docs)
    return out.select(
        "urls_scored",
        F.round("total_score", 6).alias("total_score"),
        F.round("min_score", 6).alias("min_score"),
        F.round("max_score", 6).alias("max_score"),
        F.round("average_score", 6).alias("average_score"),
    )


def q_match_config(spark, sf_dir):
    """Per-URL config matcher (F12, async_configs.py:1376-1410):
    first-match dispatch over glob matchers."""
    from crawl4ai_spark.operators.stats import match_config

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _dirty_url_col().alias("url")
    )
    configs = [
        {"id": "pdf", "matcher": "*.pdf*"},
        {"id": "en_html", "matcher": ["*/en/*", "*.html*"], "match_mode": "and"},
        {"id": "default", "matcher": None},
    ]
    return docs.select(
        "doc_id", match_config(F.col("url"), configs).alias("cfg")
    ).orderBy("doc_id")


def q_cc_seed(spark, sf_dir):
    """Common-Crawl index seed (S2, async_url_seeder.py:709-762):
    domain-scoped, pattern-filtered, distinct, URL-ordered."""
    from crawl4ai_spark.sources.cc_index import cc_index_seed

    cc = _t(spark, sf_dir, "documents").select(_dirty_url_col().alias("url"))
    return cc_index_seed(cc, "example.test", "*/en/*")


# ── the crawl loop itself (iterative; no single-SQL oracle) ──────────

def q_crawl_bfs(spark, sf_dir):
    """End-to-end BFS crawl of the deterministic synthetic web —
    returns the crawl log.  Iterative + stateful, so no SQL oracle;
    correctness is pinned by the simulator parity suite
    (tests/test_crawl_parity.py)."""
    from crawl4ai_spark.plans.config import CrawlConfig
    from crawl4ai_spark.plans.crawl import CrawlEngine
    from crawl4ai_spark.sources.synthetic_web import (
        WebConfig, robots_rows, seed_urls, synthetic_pages_df,
    )

    web = WebConfig(n_pages=80, n_hosts=4, seed=42)
    pages = synthetic_pages_df(spark, web).cache()
    robots = spark.createDataFrame(robots_rows(web))
    cfg = CrawlConfig(mode="bfs", max_depth=2, max_pages=12,
                      base_budget=8, global_budget=16, max_iterations=6)
    res = CrawlEngine(spark, cfg, pages, robots).run(seed_urls(web, n_seeds=4))
    return res.crawl_log.orderBy("iteration", "batch_rank").select(
        "iteration", "url", "depth", "outcome", "batch_rank"
    )


# ═════════════════════ the contract functions ═════════════════════════

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the training-data document pipeline at sf0.001 —
    interleaved span docs + quality + language + fingerprint, joined."""
    sf_dir = "/root/testdata/sf0.001"
    from crawl4ai_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    spans = q_interleaved_spans(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).alias("n_media"),
    )
    pred = T.lang_id("text")
    enriched = docs.select(
        "doc_id", "lang", "source", "n_chars",
        F.round(T.quality_score("text"), 6).alias("quality"),
        pred["lang"].alias("pred_lang"),
        T.fingerprint("text").alias("fingerprint"),
    )
    return enriched.join(per_doc, "doc_id").orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # gate-window rotation (r5): dict order = driver check order.
        # Never-driver-checked (r1-r4) first, then r3-last-checked, then
        # bpe_pairs (red-on-harness-typing in r4, oracle now cast), then
        # the r4 hash-green tail.
        "curation_report": q_curation_report,
        "pack_sequences": q_pack_sequences,
        "pack_stats": q_pack_stats,
        "pii_redact": q_pii_redact,
        "vocab_coverage": q_vocab_coverage,
        "sample_stratified": q_sample_stratified,
        "mixture_weights": q_mixture_weights,
        "mixture_sample": q_mixture_sample,
        "sample_budget": q_sample_budget,
        "warc_roundtrip": q_warc_roundtrip,
        "pdf_extract": q_pdf_extract,
        "revisit_priority": q_revisit_priority,
        "render_training": q_render_training,
        "span_integrity": q_span_integrity,
        "media_manifest": q_media_manifest,
        "media_decode": q_media_decode,
        "video_frames": q_video_frames,
        "interleaved_spans": q_interleaved_spans,
        "regex_entities": q_regex_entities,
        "window_chunks": q_window_chunks,
        "table_extract": q_table_extract,
        "bm25_rank": q_bm25_rank,
        "term_stats": q_term_stats,
        "adaptive_rank": q_adaptive_rank,
        "sitemap_seed": q_sitemap_seed,
        "head_parse": q_head_parse,
        "fit_markdown": q_fit_markdown,
        "bm25_fit": q_bm25_fit,
        "css_extract": q_css_extract,
        "link_scores": q_link_scores,
        "seo_score": q_seo_score,
        "relevance_score": q_relevance_score,
        "filter_stats": q_filter_stats,
        "scoring_stats": q_scoring_stats,
        "match_config": q_match_config,
        "cc_seed": q_cc_seed,
        "crawl_bfs": q_crawl_bfs,
        "bpe_pairs": q_bpe_pairs,
        # r5 additions (EmbeddingStrategy) — in the gate window
        "hash_embed": q_hash_embed,
        "embedding_coverage": q_embedding_coverage,
        "embedding_shape": q_embedding_shape,
        "embedding_select": q_embedding_select,
        "url_canonicalize": q_url_canonicalize,
        "url_host_depth": q_url_host_depth,
        "url_pattern_filter": q_url_pattern_filter,
        "url_scores": q_url_scores,
        "seen_antijoin": q_seen_antijoin,
        "pricing_summary": q_pricing_summary,
        "admission_topk": q_admission_topk,
        "region_revenue": q_region_revenue,
        "brand_revenue": q_brand_revenue,
        "order_priority": q_order_priority,
        "events_hourly": q_events_hourly,
        "events_sessionize": q_events_sessionize,
        "events_topk_users": q_events_topk_users,
        "events_props": q_events_props,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "lsh_pairs": q_lsh_pairs,
        "jaccard_pairs": q_jaccard_pairs,
        "jaccard_rare": q_jaccard_rare,
        "dedup_incremental": q_dedup_incremental,
        "dedup_clusters": q_dedup_clusters,
        "simhash": q_simhash,
        "knn_cosine": q_knn_cosine,
        "lsh_buckets": q_lsh_buckets,
        "lsh_multiprobe": q_lsh_multiprobe,
        "dedup_embedding": q_dedup_embedding,
        "embedding_clusters": q_embedding_clusters,
        "label_centroid_sim": q_label_centroid_sim,
        "ivf_topk": q_ivf_topk,
        "text_stats": q_text_stats,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "anchor_terms": q_anchor_terms,
        "pagerank": q_pagerank,
        "seed_distance": q_seed_distance,
        "hits_scores": q_hits_scores,
        "decontaminate": q_decontaminate,
        "nb_lang": q_nb_lang,
        "lm_perplexity": q_lm_perplexity,
        "ccnet_buckets": q_ccnet_buckets,
        "dsir_weights": q_dsir_weights,
        "source_reputation": q_source_reputation,
        "reputation_filter": q_reputation_filter,
        "quality_quantiles": q_quality_quantiles,
        "gopher_repetition": q_gopher_repetition,
        "gopher_quality": q_gopher_quality,
        "c4_rules": q_c4_rules,
        "cross_doc_dup": q_cross_doc_dup,
        "paragraph_dedup": q_paragraph_dedup,
    }


# ═════════════════════ DuckDB oracles ═════════════════════════════════

def oracle_sql() -> dict[str, str]:
    url = _DIRTY_URL_SQL
    # analytically-expected canonical form of the dirty URL
    canon = """
        'https://' || source || '.example.test/' || lang || '/'
        || (2019 + doc_id % 6)::VARCHAR || '/doc-' || doc_id::VARCHAR
        || (CASE WHEN doc_id % 5 = 0 THEN '.html' WHEN doc_id % 5 = 1 THEN '.pdf' ELSE '' END)
        || (CASE WHEN doc_id % 7 = 0 THEN '?b=2&a=1'
                 WHEN doc_id % 7 = 1 THEN '?a=1&b=2' ELSE '' END)
    """
    words = _WORDS_SQL
    return {
        "url_canonicalize": f"""
            SELECT doc_id, {canon} AS canon_url
            FROM documents ORDER BY doc_id
        """,
        "url_host_depth": f"""
            WITH u AS (SELECT doc_id, {url} AS url FROM documents)
            SELECT doc_id,
                   lower(regexp_extract(url, '^https?://([^/]+)', 1)) AS host,
                   lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) AS domain,
                   len(list_filter(string_split(regexp_replace(url, '^https?://[^/]*', ''), '/'),
                                   x -> x != ''))::INT AS depth
            FROM u ORDER BY doc_id
        """,
        "url_pattern_filter": f"""
            WITH u AS (SELECT doc_id, {url} AS url FROM documents)
            SELECT doc_id,
                   (list_extract(string_split(list_extract(string_split(string_split(url,'?')[1],'/'),-1),'.'),-1)
                    = 'html') AS is_html,
                   (url LIKE '%/2021/%') AS in_2021,
                   (lower(regexp_extract(url, '://([^/]+)', 1)) = 'example.test'
                    OR ends_with(lower(regexp_extract(url, '://([^/]+)', 1)), '.example.test')) AS domain_ok
            FROM u ORDER BY doc_id
        """,
        "url_scores": f"""
            WITH u AS (SELECT doc_id, {url} AS url FROM documents)
            SELECT doc_id,
                   round((
                     ((CASE WHEN contains(lower(url), 'html') THEN 1 ELSE 0 END)
                      + (CASE WHEN contains(lower(url), '2021') THEN 1 ELSE 0 END)) / 2.0
                     + (1.0 - (2024 - (2019 + doc_id % 6)) * 0.1)
                     + 1.0
                   ) / 3.0, 6) AS score
            FROM u ORDER BY doc_id
        """,
        "seen_antijoin": f"""
            SELECT doc_id, {canon} AS canon_url
            FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity::DECIMAL(14,2))::DOUBLE AS sum_qty,
                   sum(l_extendedprice::DECIMAL(14,2))::DOUBLE AS sum_base_price,
                   sum(l_extendedprice::DECIMAL(14,2) * (1::DECIMAL(14,2) - l_discount::DECIMAL(14,2)))::DOUBLE AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "admission_topk": """
            WITH ranked AS (
              SELECT o_orderkey, o_custkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS host_rank
              FROM orders
            )
            SELECT o_orderkey, o_custkey, o_totalprice, host_rank
            FROM ranked WHERE host_rank <= 2
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
        """,
        "brand_revenue": """
            SELECT p_brand,
                   sum(l_extendedprice::DECIMAL(14,2) * (1::DECIMAL(14,2) - l_discount::DECIMAL(14,2)))::DOUBLE AS revenue,
                   sum(CASE WHEN p_size >= 25
                       THEN l_extendedprice::DECIMAL(14,2) * (1::DECIMAL(14,2) - l_discount::DECIMAL(14,2))
                       ELSE 0::DECIMAL(14,2) END)::DOUBLE AS large_part_revenue,
                   count(DISTINCT s_suppkey)::INT AS n_suppliers,
                   count(*) AS n_items
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY p_brand ORDER BY p_brand
        """,
        "region_revenue": """
            SELECT r_name,
                   sum(l_extendedprice::DECIMAL(14,2) * (1::DECIMAL(14,2) - l_discount::DECIMAL(14,2)))::DOUBLE AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "order_priority": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_orderkey IN (
              SELECT DISTINCT l_orderkey FROM lineitem JOIN orders o2 ON l_orderkey = o2.o_orderkey
              WHERE l_shipdate > o2.o_orderdate
            )
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n,
                   sum(value::DECIMAL(18,9))::DOUBLE AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_sessionize": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id,
                     sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
              FROM g
            ), per_sess AS (
              SELECT user_id, session_id, count(*) AS n_events FROM s GROUP BY 1, 2
            )
            SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
            FROM per_sess GROUP BY user_id ORDER BY user_id
        """,
        "events_topk_users": """
            SELECT user_id, count(*) AS n FROM events
            GROUP BY user_id ORDER BY n DESC, user_id ASC LIMIT 10
        """,
        "events_props": """
            SELECT event_type, count(*) AS n,
                   sum(regexp_extract(props, '"k":\\s*(\\d+)', 1)::BIGINT)::BIGINT AS sum_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "dedup_exact": f"""
            WITH h AS (
              SELECT *, md5({_NORM_SQL}) AS content_hash FROM documents
            ), g AS (
              SELECT doc_id, content_hash,
                     row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn,
                     count(*) OVER (PARTITION BY content_hash) AS dup_count
              FROM h
            )
            SELECT doc_id, content_hash, dup_count FROM g WHERE rn = 1 ORDER BY doc_id
        """,
        "minhash_signatures": f"""
            WITH w AS (SELECT doc_id, {words} AS words FROM documents),
            sh AS (
              SELECT doc_id, unnest(CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(words)-2),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) END) AS shingle
              FROM w
            )
            SELECT doc_id, perm, min(md5(shingle || '#p' || perm::VARCHAR)) AS minhash
            FROM sh, (SELECT unnest(generate_series(0, 7)) AS perm)
            GROUP BY doc_id, perm ORDER BY doc_id, perm
        """,
        "lsh_pairs": f"""
            WITH w AS (SELECT doc_id, {words} AS words FROM documents),
            sh AS (
              SELECT doc_id, unnest(CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(words)-2),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) END) AS shingle
              FROM w
            ), sig AS (
              SELECT doc_id, perm, min(md5(shingle || '#p' || perm::VARCHAR)) AS minhash
              FROM sh, (SELECT unnest(generate_series(0, 7)) AS perm)
              GROUP BY doc_id, perm
            ), banded AS (
              SELECT doc_id, perm // 2 AS band,
                     array_to_string(list_sort(list(minhash)), '|') AS band_key
              FROM sig GROUP BY doc_id, perm // 2
            )
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM banded x JOIN banded y ON x.band = y.band AND x.band_key = y.band_key
            WHERE x.doc_id < y.doc_id
            ORDER BY a, b
        """,
        "jaccard_pairs": f"""
            WITH w AS (SELECT doc_id, {words} AS words FROM documents),
            sh AS (
              SELECT doc_id, unnest(CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(words)-2),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) END) AS shingle
              FROM w
            ), sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            sig AS (
              SELECT doc_id, perm, min(md5(shingle || '#p' || perm::VARCHAR)) AS minhash
              FROM sh, (SELECT unnest(generate_series(0, 7)) AS perm)
              GROUP BY doc_id, perm
            ), banded AS (
              SELECT doc_id, perm // 2 AS band,
                     array_to_string(list_sort(list(minhash)), '|') AS band_key
              FROM sig GROUP BY doc_id, perm // 2
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM banded x JOIN banded y ON x.band = y.band AND x.band_key = y.band_key
              WHERE x.doc_id < y.doc_id
            ),
            inter AS (
              SELECT c.a, c.b, count(*) AS i
              FROM cand c
              JOIN sh sx ON sx.doc_id = c.a
              JOIN sh sy ON sy.doc_id = c.b AND sy.shingle = sx.shingle
              GROUP BY 1, 2
            )
            SELECT a, b, round(i / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
            FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
            WHERE i / (sa.n_sh + sb.n_sh - i) >= 0.12
            ORDER BY a, b
        """,
        "dedup_incremental": f"""
            WITH w AS (SELECT doc_id, {words} AS words FROM documents),
            sh AS (
              SELECT doc_id, unnest(CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(words)-2),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) END) AS shingle
              FROM w
            ), sig AS (
              SELECT doc_id, perm, min(md5(shingle || '#p' || perm::VARCHAR)) AS minhash
              FROM sh, (SELECT unnest(generate_series(0, 7)) AS perm)
              GROUP BY doc_id, perm
            ), banded AS (
              SELECT doc_id, perm // 2 AS band,
                     array_to_string(list_sort(list(minhash)), '|') AS band_key
              FROM sig GROUP BY doc_id, perm // 2
            ), cand AS (
              SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
              FROM banded n JOIN banded o ON n.band = o.band AND n.band_key = o.band_key
              WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 != 0
            ), est AS (
              SELECT c.new_id, c.old_id,
                     sum(CASE WHEN sn.minhash = so.minhash THEN 1 ELSE 0 END)::DOUBLE / 8 AS est_jaccard
              FROM cand c
              JOIN sig sn ON sn.doc_id = c.new_id
              JOIN sig so ON so.doc_id = c.old_id AND so.perm = sn.perm
              GROUP BY 1, 2
            ), best AS (
              SELECT new_id, old_id, est_jaccard,
                     row_number() OVER (PARTITION BY new_id
                                        ORDER BY est_jaccard DESC, old_id ASC) AS rn
              FROM est
            )
            SELECT d.doc_id,
                   coalesce(b.est_jaccard >= 0.5, false) AS is_dup,
                   b.old_id AS matched_id,
                   round(b.est_jaccard, 6) AS est_jaccard
            FROM documents d
            LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.new_id = d.doc_id
            WHERE d.doc_id % 5 = 0
            ORDER BY d.doc_id
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE w AS (SELECT doc_id, {words} AS words FROM documents),
            sh AS (
              SELECT doc_id, unnest(CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(words)-2),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) END) AS shingle
              FROM w
            ), sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            sig AS (
              SELECT doc_id, perm, min(md5(shingle || '#p' || perm::VARCHAR)) AS minhash
              FROM sh, (SELECT unnest(generate_series(0, 7)) AS perm)
              GROUP BY doc_id, perm
            ), banded AS (
              SELECT doc_id, perm // 2 AS band,
                     array_to_string(list_sort(list(minhash)), '|') AS band_key
              FROM sig GROUP BY doc_id, perm // 2
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM banded x JOIN banded y ON x.band = y.band AND x.band_key = y.band_key
              WHERE x.doc_id < y.doc_id
            ),
            inter AS (
              SELECT c.a, c.b, count(*) AS i
              FROM cand c
              JOIN sh sx ON sx.doc_id = c.a
              JOIN sh sy ON sy.doc_id = c.b AND sy.shingle = sx.shingle
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT a, b
              FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
              WHERE i / (sa.n_sh + sb.n_sh - i) >= 0.12
            ),
            sym AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
            reach(u, v) AS (
              SELECT u, v FROM sym
              UNION
              SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
            ),
            comp AS (
              SELECT d.doc_id,
                     least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
              FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
              GROUP BY d.doc_id
            ),
            cs AS (SELECT cluster_id, count(*)::INT AS cluster_size FROM comp GROUP BY cluster_id)
            SELECT doc_id, cluster_id, (doc_id = cluster_id) AS is_canonical, cluster_size
            FROM comp JOIN cs USING (cluster_id) ORDER BY doc_id
        """,
        "jaccard_rare": f"""
            WITH w AS (SELECT doc_id, {words} AS words FROM documents),
            sh AS (
              SELECT doc_id, unnest(CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(words)-2),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) END) AS shingle
              FROM w
            ), sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            dfreq AS (SELECT shingle, count(*) AS dfx FROM sh GROUP BY shingle),
            rare AS (
              SELECT sh.doc_id, sh.shingle FROM sh
              JOIN dfreq ON sh.shingle = dfreq.shingle WHERE dfreq.dfx <= 60
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM rare x JOIN rare y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
            ),
            inter AS (
              SELECT c.a, c.b, count(*) AS i
              FROM cand c
              JOIN sh sx ON sx.doc_id = c.a
              JOIN sh sy ON sy.doc_id = c.b AND sy.shingle = sx.shingle
              GROUP BY 1, 2
            )
            SELECT a, b, round(i / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
            FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
            WHERE i / (sa.n_sh + sb.n_sh - i) >= 0.12
            ORDER BY a, b
        """,
        "simhash": f"""
            WITH toks AS (
              SELECT doc_id, unnest({words}) AS tok FROM documents
            ), h AS (
              SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks
            ), bits AS (
              SELECT doc_id, i,
                     sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM h, (SELECT unnest(generate_series(0, 31)) AS i)
              GROUP BY doc_id, i
            )
            SELECT doc_id, sum(CASE WHEN s > 0 THEN 1::BIGINT << i ELSE 0 END)::BIGINT AS simhash32
            FROM bits GROUP BY doc_id ORDER BY doc_id
        """,
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
            c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 3),
            scored AS (
              SELECT q.query_id, c.vec_id,
                     list_sum(list_transform(generate_series(1, len(c.embedding)),
                              i -> c.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
                     / (sqrt(list_sum(list_transform(generate_series(1, len(c.embedding)),
                              i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
                        * sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),
                              i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))) AS cos_raw
              FROM c, q
            ), ranked AS (
              SELECT query_id, vec_id, cos_raw,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, vec_id, round(cos_raw, 6) AS cos_sim, rank
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "lsh_multiprobe": """
            WITH b AS (
              SELECT vec_id, embedding,
                list_sum(list_transform(generate_series(0, 5), p ->
                  CASE WHEN
                    list_sum(list_transform(generate_series(1, len(embedding)), i ->
                      embedding[i]::DOUBLE *
                      (CASE WHEN substr(md5(p::VARCHAR || '_' || (i-1)::VARCHAR), 1, 1)
                            IN ('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END)))
                    > 0
                  THEN 1 << p ELSE 0 END))::BIGINT AS bucket
              FROM embeddings
            ),
            q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 8),
            c AS (SELECT vec_id, embedding, bucket FROM b WHERE vec_id >= 8),
            probes AS (
              SELECT q.query_id, q.qv, xor(q.bucket, m.mask) AS bucket
              FROM q, (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS mask) m
            ),
            scored AS (
              SELECT p.query_id, c.vec_id,
                     list_sum(list_transform(generate_series(1, len(c.embedding)),
                              i -> c.embedding[i]::DOUBLE * p.qv[i]::DOUBLE))
                     / (sqrt(list_sum(list_transform(generate_series(1, len(c.embedding)),
                              i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
                        * sqrt(list_sum(list_transform(generate_series(1, len(p.qv)),
                              i -> p.qv[i]::DOUBLE * p.qv[i]::DOUBLE)))) AS cos_raw
              FROM c JOIN probes p ON c.bucket = p.bucket
            ), ranked AS (
              SELECT query_id, vec_id, cos_raw,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, vec_id, round(cos_raw, 6) AS cos_sim, rank
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "embedding_clusters": """
            WITH RECURSIVE b AS (
              SELECT vec_id, embedding,
                list_sum(list_transform(generate_series(0, 5), p ->
                  CASE WHEN
                    list_sum(list_transform(generate_series(1, len(embedding)), i ->
                      embedding[i]::DOUBLE *
                      (CASE WHEN substr(md5(p::VARCHAR || '_' || (i-1)::VARCHAR), 1, 1)
                            IN ('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END)))
                    > 0
                  THEN 1 << p ELSE 0 END))::BIGINT AS bucket
              FROM embeddings
            ),
            pairs AS (
              SELECT l.vec_id AS a, r.vec_id AS b,
                list_sum(list_transform(generate_series(1, len(l.embedding)),
                         i -> l.embedding[i]::DOUBLE * r.embedding[i]::DOUBLE))
                / (sqrt(list_sum(list_transform(generate_series(1, len(l.embedding)),
                         i -> l.embedding[i]::DOUBLE * l.embedding[i]::DOUBLE)))
                 * sqrt(list_sum(list_transform(generate_series(1, len(r.embedding)),
                         i -> r.embedding[i]::DOUBLE * r.embedding[i]::DOUBLE)))) AS cos_raw
              FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
            ),
            edges AS (SELECT a, b FROM pairs WHERE cos_raw >= 0.3),
            sym AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
            reach(u, v) AS (
              SELECT u, v FROM sym
              UNION
              SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
            ),
            comp AS (
              SELECT e.vec_id,
                     least(e.vec_id, coalesce(min(r.v), e.vec_id)) AS cluster_id
              FROM embeddings e LEFT JOIN reach r ON r.u = e.vec_id
              GROUP BY e.vec_id
            ),
            cs AS (SELECT cluster_id, count(*)::INT AS cluster_size FROM comp GROUP BY cluster_id)
            SELECT vec_id, cluster_id, (vec_id = cluster_id) AS is_canonical, cluster_size
            FROM comp JOIN cs USING (cluster_id) ORDER BY vec_id
        """,
        "dedup_embedding": """
            WITH b AS (
              SELECT vec_id, embedding,
                list_sum(list_transform(generate_series(0, 5), p ->
                  CASE WHEN
                    list_sum(list_transform(generate_series(1, len(embedding)), i ->
                      embedding[i]::DOUBLE *
                      (CASE WHEN substr(md5(p::VARCHAR || '_' || (i-1)::VARCHAR), 1, 1)
                            IN ('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END)))
                    > 0
                  THEN 1 << p ELSE 0 END))::BIGINT AS bucket
              FROM embeddings
            ),
            pairs AS (
              SELECT l.vec_id AS a, r.vec_id AS b,
                list_sum(list_transform(generate_series(1, len(l.embedding)),
                         i -> l.embedding[i]::DOUBLE * r.embedding[i]::DOUBLE))
                / (sqrt(list_sum(list_transform(generate_series(1, len(l.embedding)),
                         i -> l.embedding[i]::DOUBLE * l.embedding[i]::DOUBLE)))
                 * sqrt(list_sum(list_transform(generate_series(1, len(r.embedding)),
                         i -> r.embedding[i]::DOUBLE * r.embedding[i]::DOUBLE)))) AS cos_raw
              FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
            )
            SELECT a, b, round(cos_raw, 6) AS cos_sim
            FROM pairs WHERE cos_raw >= 0.3 ORDER BY a, b
        """,
        "lsh_buckets": """
            WITH b AS (
              SELECT vec_id,
                list_sum(list_transform(generate_series(0, 5), p ->
                  CASE WHEN
                    list_sum(list_transform(generate_series(1, len(embedding)), i ->
                      embedding[i]::DOUBLE *
                      (CASE WHEN substr(md5(p::VARCHAR || '_' || (i-1)::VARCHAR), 1, 1)
                            IN ('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END)))
                    > 0
                  THEN 1 << p ELSE 0 END))::BIGINT AS bucket
              FROM embeddings
            )
            SELECT bucket, count(*) AS n_vecs FROM b GROUP BY bucket ORDER BY bucket
        """,
        "label_centroid_sim": """
            WITH ex AS (
              SELECT label, vec_id,
                     unnest(embedding)::DOUBLE AS x,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings
            ),
            cent AS (SELECT label, i, avg(x) AS c FROM ex GROUP BY label, i),
            cn AS (SELECT label, sqrt(sum(c*c)) AS nc FROM cent GROUP BY label),
            d AS (
              SELECT e.label, e.vec_id, sum(e.x*c.c) AS dot,
                     sqrt(sum(e.x*e.x)) AS nv
              FROM ex e JOIN cent c ON e.label=c.label AND e.i=c.i
              GROUP BY e.label, e.vec_id
            ),
            s AS (
              SELECT d.label, d.dot/(d.nv*cn.nc) AS sim
              FROM d JOIN cn ON d.label=cn.label
            )
            SELECT label, count(*) AS n_vecs, round(avg(sim), 6) AS avg_sim,
                   sum(CASE WHEN sim >= 0.415 THEN 1 ELSE 0 END)::BIGINT AS n_similar
            FROM s GROUP BY label ORDER BY label
        """,
        "ivf_topk": """
            WITH ex AS (
              SELECT vec_id, unnest(embedding)::DOUBLE AS x,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings
            ),
            cent AS (
              SELECT e2.label AS cell, ex.i, avg(ex.x) AS c
              FROM ex JOIN embeddings e2 USING (vec_id) GROUP BY e2.label, ex.i
            ),
            cn AS (SELECT cell, sqrt(sum(c*c)) AS nc FROM cent GROUP BY cell),
            vn AS (SELECT vec_id, sqrt(sum(x*x)) AS nv FROM ex GROUP BY vec_id),
            sims AS (
              SELECT ex.vec_id, cent.cell,
                     sum(ex.x * cent.c) / (any_value(vn.nv) * any_value(cn.nc)) AS sim
              FROM ex JOIN cent ON ex.i = cent.i
              JOIN vn ON vn.vec_id = ex.vec_id JOIN cn ON cn.cell = cent.cell
              GROUP BY ex.vec_id, cent.cell
            ),
            asgn AS (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS r
              FROM sims
            ),
            c AS (
              SELECT e.vec_id, e.embedding, a.cell
              FROM embeddings e JOIN asgn a ON a.vec_id = e.vec_id AND a.r = 1
              WHERE e.vec_id >= 8
            ),
            q AS (
              SELECT e.vec_id AS query_id, e.embedding AS qv, a.cell
              FROM embeddings e JOIN asgn a ON a.vec_id = e.vec_id AND a.r <= 2
              WHERE e.vec_id < 8
            ),
            scored AS (
              SELECT q.query_id, c.vec_id,
                     list_sum(list_transform(generate_series(1, len(c.embedding)),
                              i -> c.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
                     / (sqrt(list_sum(list_transform(generate_series(1, len(c.embedding)),
                              i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
                        * sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),
                              i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))) AS cos_raw
              FROM c JOIN q ON c.cell = q.cell
            ), ranked AS (
              SELECT query_id, vec_id, cos_raw,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, vec_id, round(cos_raw, 6) AS cos_sim, rank
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "text_stats": f"""
            WITH w AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS words
              FROM documents
            )
            SELECT doc_id,
                   len(words) AS n_words,
                   length(text) AS n_chars,
                   round(CASE WHEN len(words) > 0
                         THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words)
                         ELSE 0.0 END, 6) AS mean_word_len,
                   round(CASE WHEN length(text) > 0
                         THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE / length(text)
                         ELSE 0.0 END, 6) AS punct_ratio,
                   CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS regex_tokens
            FROM w ORDER BY doc_id
        """,
        "text_quality": """
            WITH w AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(lower(text), '[^a-zA-Zà-ÿä-üá-ú]+'), x -> x != '') AS lw,
                     list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS words
              FROM documents
            ), m AS (
              SELECT doc_id, text, words,
                     CASE WHEN len(lw) > 0 THEN
                       len(list_filter(lw, x -> x IN ('the','and','of','to','in','is','that','it','for','with','was','on')))::DOUBLE / len(lw)
                     ELSE 0.0 END AS swr,
                     CASE WHEN length(text) > 0
                          THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE / length(text)
                          ELSE 0.0 END AS pr,
                     CASE WHEN len(words) > 0
                          THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words)
                          ELSE 0.0 END AS mwl
              FROM w
            )
            SELECT doc_id,
                   round(
                     0.3 * (CASE WHEN length(text) >= 200 THEN 1.0 WHEN length(text) >= 50 THEN 0.5 ELSE 0.0 END)
                   + 0.3 * (CASE WHEN swr >= 0.2 THEN 1.0 WHEN swr >= 0.08 THEN 0.5 ELSE 0.0 END)
                   + 0.2 * greatest(0.0, 1.0 - greatest(0.0, (pr - 0.15) * 4))
                   + 0.2 * (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.3 END), 6) AS quality,
                   round(swr, 6) AS stopword_ratio_en
            FROM m ORDER BY doc_id
        """,
        "lang_id": """
            WITH w AS (
              SELECT doc_id, lang,
                     list_filter(string_split_regex(lower(text), '[^a-zA-Zà-ÿä-üá-ú]+'), x -> x != '') AS lw
              FROM documents
            ), h AS (
              SELECT doc_id, lang,
                len(list_filter(lw, x -> x IN ('the','and','of','to','in','is','that','it','for','with','was','on'))) AS h_en,
                len(list_filter(lw, x -> x IN ('der','die','das','und','ist','nicht','mit','ein','eine','den','von','zu'))) AS h_de,
                len(list_filter(lw, x -> x IN ('le','la','les','et','est','des','une','dans','que','pour','qui','pas'))) AS h_fr,
                len(list_filter(lw, x -> x IN ('el','la','los','las','es','una','por','con','para','del','como','pero'))) AS h_es
              FROM w
            )
            SELECT doc_id, lang,
                   CASE WHEN h_en > 0 AND h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
                        WHEN h_de > 0 AND h_de >= h_fr AND h_de >= h_es THEN 'de'
                        WHEN h_fr > 0 AND h_fr >= h_es THEN 'fr'
                        WHEN h_es > 0 THEN 'es'
                        ELSE 'und' END AS pred_lang,
                   greatest(h_en, h_de, h_fr, h_es) AS sw_hits
            FROM h ORDER BY doc_id
        """,
        "anchor_terms": f"""
            WITH d AS (SELECT doc_id FROM documents),
            nc AS (SELECT count(*) AS c FROM d),
            {_SYNTH_EDGES_SQL},
            a AS (
              SELECT e.src, e.dst,
                     array_to_string(({words})[1:3], ' ') AS anchor
              FROM e JOIN (SELECT doc_id, text FROM documents) t
                ON t.doc_id = e.src
            ),
            stats AS (
              SELECT dst, count(*)::BIGINT AS n_inlinks,
                     count(DISTINCT src)::BIGINT AS n_sources
              FROM a GROUP BY dst
            ),
            terms AS (
              SELECT dst, term, count(*)::BIGINT AS term_count
              FROM (
                SELECT dst, unnest(list_filter(string_split(anchor, ' '),
                                               x -> x != '')) AS term
                FROM a
              ) GROUP BY dst, term
            ),
            top AS (
              SELECT dst, term, term_count,
                     row_number() OVER (PARTITION BY dst
                                        ORDER BY term_count DESC, term ASC) AS rank
              FROM terms
            )
            SELECT t.dst, s.n_inlinks, s.n_sources, t.term, t.term_count, t.rank
            FROM top t JOIN stats s USING (dst)
            WHERE t.rank <= 3
            ORDER BY t.dst, t.rank
        """,
        "pagerank": f"""
            WITH d AS (SELECT doc_id FROM documents),
            nn AS (SELECT count(*)::DOUBLE AS n FROM d),
            nc AS (SELECT count(*) AS c FROM d),
            {_SYNTH_EDGES_SQL},
            deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
            r0 AS (SELECT doc_id AS vid, 1.0 / (SELECT n FROM nn) AS rank FROM d),
            s1 AS (SELECT coalesce(sum(r.rank), 0) AS shipped FROM r0 r JOIN deg ON r.vid = deg.src),
            c1 AS (SELECT e.dst, sum(r.rank / deg.deg) AS inflow
                   FROM e JOIN deg USING (src) JOIN r0 r ON r.vid = e.src GROUP BY e.dst),
            r1 AS (SELECT d.doc_id AS vid,
                     0.15 / (SELECT n FROM nn)
                     + 0.85 * (coalesce(c1.inflow, 0) + (1.0 - (SELECT shipped FROM s1)) / (SELECT n FROM nn)) AS rank
                   FROM d LEFT JOIN c1 ON c1.dst = d.doc_id),
            s2 AS (SELECT coalesce(sum(r.rank), 0) AS shipped FROM r1 r JOIN deg ON r.vid = deg.src),
            c2 AS (SELECT e.dst, sum(r.rank / deg.deg) AS inflow
                   FROM e JOIN deg USING (src) JOIN r1 r ON r.vid = e.src GROUP BY e.dst),
            r2 AS (SELECT d.doc_id AS vid,
                     0.15 / (SELECT n FROM nn)
                     + 0.85 * (coalesce(c2.inflow, 0) + (1.0 - (SELECT shipped FROM s2)) / (SELECT n FROM nn)) AS rank
                   FROM d LEFT JOIN c2 ON c2.dst = d.doc_id),
            s3 AS (SELECT coalesce(sum(r.rank), 0) AS shipped FROM r2 r JOIN deg ON r.vid = deg.src),
            c3 AS (SELECT e.dst, sum(r.rank / deg.deg) AS inflow
                   FROM e JOIN deg USING (src) JOIN r2 r ON r.vid = e.src GROUP BY e.dst),
            r3 AS (SELECT d.doc_id AS vid,
                     0.15 / (SELECT n FROM nn)
                     + 0.85 * (coalesce(c3.inflow, 0) + (1.0 - (SELECT shipped FROM s3)) / (SELECT n FROM nn)) AS rank
                   FROM d LEFT JOIN c3 ON c3.dst = d.doc_id)
            SELECT vid AS doc_id, round(rank, 6) AS rank FROM r3 ORDER BY doc_id
        """,
        "seed_distance": f"""
            WITH RECURSIVE d AS (SELECT doc_id FROM documents),
            nc AS (SELECT count(*) AS c FROM d),
            {_SYNTH_EDGES_SQL},
            r(vid, depth) AS (
              SELECT doc_id, 0 FROM d WHERE doc_id % 101 = 0
              UNION
              SELECT e.dst, r.depth + 1 FROM r JOIN e ON e.src = r.vid
              WHERE r.depth < 4
            )
            SELECT vid AS doc_id, min(depth) AS depth FROM r
            GROUP BY vid ORDER BY doc_id
        """,
        "hits_scores": f"""
            WITH d AS (SELECT doc_id FROM documents),
            nn AS (SELECT count(*)::DOUBLE AS n FROM d),
            nc AS (SELECT count(*) AS c FROM d),
            {_SYNTH_EDGES_SQL},
            h0 AS (SELECT doc_id AS vid, 1.0 / (SELECT n FROM nn) AS s FROM d),
            a1r AS (SELECT d.doc_id AS vid, coalesce(sum(h0.s), 0) AS s
                    FROM d LEFT JOIN e ON e.dst = d.doc_id
                           LEFT JOIN h0 ON h0.vid = e.src
                    GROUP BY d.doc_id),
            a1 AS (SELECT vid, s / (SELECT sum(s) FROM a1r) AS s FROM a1r),
            h1r AS (SELECT d.doc_id AS vid, coalesce(sum(a1.s), 0) AS s
                    FROM d LEFT JOIN e ON e.src = d.doc_id
                           LEFT JOIN a1 ON a1.vid = e.dst
                    GROUP BY d.doc_id),
            h1 AS (SELECT vid, s / (SELECT sum(s) FROM h1r) AS s FROM h1r),
            a2r AS (SELECT d.doc_id AS vid, coalesce(sum(h1.s), 0) AS s
                    FROM d LEFT JOIN e ON e.dst = d.doc_id
                           LEFT JOIN h1 ON h1.vid = e.src
                    GROUP BY d.doc_id),
            a2 AS (SELECT vid, s / (SELECT sum(s) FROM a2r) AS s FROM a2r),
            h2r AS (SELECT d.doc_id AS vid, coalesce(sum(a2.s), 0) AS s
                    FROM d LEFT JOIN e ON e.src = d.doc_id
                           LEFT JOIN a2 ON a2.vid = e.dst
                    GROUP BY d.doc_id),
            h2 AS (SELECT vid, s / (SELECT sum(s) FROM h2r) AS s FROM h2r)
            SELECT d.doc_id, round(h2.s, 6) AS hub, round(a2.s, 6) AS auth
            FROM d JOIN h2 ON h2.vid = d.doc_id JOIN a2 ON a2.vid = d.doc_id
            ORDER BY d.doc_id
        """,
        "decontaminate": r"""
            WITH w AS (SELECT doc_id, list_filter(string_split(
                   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                   x -> x != '') AS words FROM documents),
            g AS (
              SELECT doc_id, unnest(CASE WHEN len(words) < 5
                THEN [array_to_string(words, ' ')]
                ELSE list_distinct(list_transform(
                     generate_series(1, len(words) - 4),
                     i -> array_to_string(words[i:i+4], ' '))) END) AS gram
              FROM w
            ),
            b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
            h AS (SELECT g.doc_id, count(*) AS bench_gram_hits
                  FROM g JOIN b USING (gram) GROUP BY g.doc_id)
            SELECT d.doc_id,
                   coalesce(h.bench_gram_hits, 0) AS bench_gram_hits,
                   coalesce(h.bench_gram_hits, 0) >= 2 AS contaminated
            FROM documents d LEFT JOIN h USING (doc_id) ORDER BY doc_id
        """,
        "nb_lang": r"""
            WITH w AS (SELECT doc_id, lang, list_filter(string_split(
                   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                   x -> x != '') AS words FROM documents),
            tok AS (SELECT doc_id, lang, unnest(words) AS token FROM w),
            tcd AS (SELECT doc_id, lang, token, count(*) AS n
                    FROM tok GROUP BY doc_id, lang, token),
            train AS (SELECT * FROM tcd WHERE doc_id % 2 = 0),
            cls AS (SELECT lang AS label, count(DISTINCT doc_id) AS docs_c,
                           sum(n) AS tokens_c
                    FROM train GROUP BY lang),
            tot AS (SELECT sum(docs_c)::DOUBLE AS t FROM cls),
            vocab AS (SELECT DISTINCT token FROM train),
            vsz AS (SELECT count(*)::DOUBLE AS v FROM vocab),
            ts AS (SELECT label, token, ln(sum(n) + 1.0) AS loglik
                   FROM (SELECT t.lang AS label, t.token, t.n FROM train t)
                   GROUP BY label, token),
            dt AS (SELECT c.doc_id, c.token, c.n
                   FROM tcd c JOIN vocab USING (token)),
            md AS (SELECT doc_id, sum(n) AS m FROM dt GROUP BY doc_id),
            hits AS (SELECT dt.doc_id, ts.label,
                            sum(dt.n * ts.loglik) AS hit_sum
                     FROM dt JOIN ts USING (token)
                     GROUP BY dt.doc_id, ts.label),
            scores AS (
              SELECT md.doc_id, c.label,
                     ln(c.docs_c / (SELECT t FROM tot))
                     - md.m * ln(c.tokens_c + (SELECT v FROM vsz))
                     + coalesce(h.hit_sum, 0) AS score
              FROM md CROSS JOIN cls c
              LEFT JOIN hits h ON h.doc_id = md.doc_id AND h.label = c.label)
            SELECT doc_id, label AS pred_lang, round(score, 6) AS score
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, label) AS rn
                  FROM scores)
            WHERE rn = 1 ORDER BY doc_id
        """,
        "lm_perplexity": r"""
            WITH d AS (SELECT doc_id, lang, list_filter(string_split(
                   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                   x -> x != '') AS ws FROM documents),
            big AS (
              SELECT doc_id, lang,
                     unnest(list_transform(generate_series(1, len(ws) - 1),
                            i -> ws[i] || ' ' || ws[i+1])) AS bigram
              FROM d WHERE len(ws) >= 2
            ),
            ref AS (SELECT bigram FROM big WHERE lang = 'en'),
            vocab AS (
              SELECT count(DISTINCT tok)::DOUBLE AS v
              FROM (SELECT unnest(ws) AS tok FROM d WHERE lang = 'en')
            ),
            counts AS (
              SELECT bigram, split_part(bigram, ' ', 1) AS w1,
                     count(*)::DOUBLE AS c
              FROM ref GROUP BY bigram
            ),
            ctxn AS (SELECT w1, sum(c) AS n_ctx FROM counts GROUP BY w1),
            model AS (
              SELECT bigram, ln((c + 0.1) / (n_ctx + 0.1 * v)) AS logp
              FROM counts JOIN ctxn USING (w1) CROSS JOIN vocab
            ),
            ctx AS (
              SELECT w1, ln(0.1 / (n_ctx + 0.1 * v)) AS logp_unseen
              FROM ctxn CROSS JOIN vocab
            )
            SELECT b.doc_id, count(*) AS n_bigrams,
                   round(-avg(coalesce(m.logp, cx.logp_unseen, -ln(v))), 6) AS log_ppl
            FROM big b
            LEFT JOIN model m USING (bigram)
            LEFT JOIN ctx cx ON split_part(b.bigram, ' ', 1) = cx.w1
            CROSS JOIN vocab
            GROUP BY b.doc_id ORDER BY b.doc_id
        """,
        "ccnet_buckets": r"""
            WITH d AS (SELECT doc_id, lang, list_filter(string_split(
                   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                   x -> x != '') AS ws FROM documents),
            big AS (
              SELECT doc_id, lang,
                     unnest(list_transform(generate_series(1, len(ws) - 1),
                            i -> ws[i] || ' ' || ws[i+1])) AS bigram
              FROM d WHERE len(ws) >= 2
            ),
            ref AS (SELECT bigram FROM big WHERE lang = 'en'),
            vocab AS (
              SELECT count(DISTINCT tok)::DOUBLE AS v
              FROM (SELECT unnest(ws) AS tok FROM d WHERE lang = 'en')
            ),
            counts AS (
              SELECT bigram, split_part(bigram, ' ', 1) AS w1,
                     count(*)::DOUBLE AS c
              FROM ref GROUP BY bigram
            ),
            ctxn AS (SELECT w1, sum(c) AS n_ctx FROM counts GROUP BY w1),
            model AS (
              SELECT bigram, ln((c + 0.1) / (n_ctx + 0.1 * v)) AS logp
              FROM counts JOIN ctxn USING (w1) CROSS JOIN vocab
            ),
            ctx AS (
              SELECT w1, ln(0.1 / (n_ctx + 0.1 * v)) AS logp_unseen
              FROM ctxn CROSS JOIN vocab
            ),
            scored AS (
              SELECT b.doc_id, b.lang,
                     -avg(coalesce(m.logp, cx.logp_unseen, -ln(v))) AS log_ppl
              FROM big b
              LEFT JOIN model m USING (bigram)
              LEFT JOIN ctx cx ON split_part(b.bigram, ' ', 1) = cx.w1
              CROSS JOIN vocab
              GROUP BY b.doc_id, b.lang
            ),
            cutd AS (
              SELECT lang,
                     round(quantile_cont(log_ppl, 1.0/3.0), 6) AS c1,
                     round(quantile_cont(log_ppl, 2.0/3.0), 6) AS c2
              FROM scored GROUP BY lang
            )
            SELECT s.doc_id, s.lang, round(s.log_ppl, 6) AS log_ppl,
                   CASE WHEN round(s.log_ppl, 6) <= c.c1 THEN 'head'
                        WHEN round(s.log_ppl, 6) <= c.c2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scored s JOIN cutd c USING (lang)
            ORDER BY s.doc_id
        """,
        "dsir_weights": r"""
            WITH d AS (SELECT doc_id, lang, list_filter(string_split(
                   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                   x -> x != '') AS ws FROM documents),
            feats AS (
              SELECT doc_id, lang, unnest(list_concat(ws,
                     CASE WHEN len(ws) >= 2
                          THEN list_transform(generate_series(1, len(ws) - 1),
                                              i -> ws[i] || ' ' || ws[i+1])
                          ELSE []::VARCHAR[] END)) AS feat
              FROM d
            ),
            fb AS (
              SELECT doc_id, lang,
                     ('0x' || substr(md5(feat), 1, 8))::BIGINT % 512 AS bucket
              FROM feats
            ),
            tc AS (SELECT bucket, count(*)::DOUBLE AS c_t FROM fb
                   WHERE lang = 'en' GROUP BY bucket),
            rc AS (SELECT bucket, count(*)::DOUBLE AS c_r FROM fb GROUP BY bucket),
            tt AS (SELECT sum(c_t) AS n_t FROM tc),
            rt AS (SELECT sum(c_r) AS n_r FROM rc),
            dim AS (
              SELECT g.bucket,
                     ln((coalesce(c_t, 0) + 1.0) / (n_t + 512.0))
                   - ln((coalesce(c_r, 0) + 1.0) / (n_r + 512.0)) AS log_ratio
              FROM (SELECT unnest(generate_series(0, 511)) AS bucket) g
              LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
              CROSS JOIN tt CROSS JOIN rt
            )
            SELECT f.doc_id, count(*) AS n_feats,
                   round(sum(dim.log_ratio), 6) AS log_weight
            FROM fb f JOIN dim USING (bucket)
            GROUP BY f.doc_id ORDER BY f.doc_id
        """,
        "source_reputation": """
            WITH w AS (
              SELECT doc_id, source, lang, text,
                     list_filter(string_split_regex(lower(text), '[^a-zA-Zà-ÿä-üá-ú]+'), x -> x != '') AS lw,
                     list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS words
              FROM documents
            ), m AS (
              SELECT doc_id, source, lang, text, words,
                     CASE WHEN len(lw) > 0 THEN
                       len(list_filter(lw, x -> x IN ('the','and','of','to','in','is','that','it','for','with','was','on')))::DOUBLE / len(lw)
                     ELSE 0.0 END AS swr,
                     CASE WHEN length(text) > 0
                          THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE / length(text)
                          ELSE 0.0 END AS pr,
                     CASE WHEN len(words) > 0
                          THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words)
                          ELSE 0.0 END AS mwl
              FROM w
            ), qv AS (
              SELECT doc_id, source, lang, text,
                     0.3 * (CASE WHEN length(text) >= 200 THEN 1.0 WHEN length(text) >= 50 THEN 0.5 ELSE 0.0 END)
                   + 0.3 * (CASE WHEN swr >= 0.2 THEN 1.0 WHEN swr >= 0.08 THEN 0.5 ELSE 0.0 END)
                   + 0.2 * greatest(0.0, 1.0 - greatest(0.0, (pr - 0.15) * 4))
                   + 0.2 * (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.3 END) AS q
              FROM m
            ), base AS (
              SELECT source, count(*) AS n_docs, avg(q) AS mean_quality,
                     count(DISTINCT text) AS n_distinct,
                     avg(length(text)::DOUBLE) AS mean_chars
              FROM qv GROUP BY source
            ), lc AS (
              SELECT source, lang, count(*) AS n_lang FROM qv GROUP BY source, lang
            ), pur AS (
              SELECT source, max(n_lang)::DOUBLE / sum(n_lang) AS lang_purity
              FROM lc GROUP BY source
            )
            SELECT b.source, b.n_docs,
                   round(b.mean_quality, 6) AS mean_quality,
                   round(1.0 - b.n_distinct::DOUBLE / b.n_docs, 6) AS dup_rate,
                   round(p.lang_purity, 6) AS lang_purity,
                   round(b.mean_chars, 6) AS mean_chars,
                   round(0.4 * b.mean_quality
                       + 0.3 * (1.0 - (1.0 - b.n_distinct::DOUBLE / b.n_docs))
                       + 0.3 * p.lang_purity, 6) AS reputation
            FROM base b JOIN pur p USING (source)
            ORDER BY source
        """,
        "reputation_filter": """
            WITH w AS (
              SELECT doc_id, source, lang, text,
                     list_filter(string_split_regex(lower(text), '[^a-zA-Zà-ÿä-üá-ú]+'), x -> x != '') AS lw,
                     list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS words
              FROM documents
            ), m AS (
              SELECT doc_id, source, lang, text, words,
                     CASE WHEN len(lw) > 0 THEN
                       len(list_filter(lw, x -> x IN ('the','and','of','to','in','is','that','it','for','with','was','on')))::DOUBLE / len(lw)
                     ELSE 0.0 END AS swr,
                     CASE WHEN length(text) > 0
                          THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE / length(text)
                          ELSE 0.0 END AS pr,
                     CASE WHEN len(words) > 0
                          THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words)
                          ELSE 0.0 END AS mwl
              FROM w
            ), qv AS (
              SELECT doc_id, source, lang, text,
                     0.3 * (CASE WHEN length(text) >= 200 THEN 1.0 WHEN length(text) >= 50 THEN 0.5 ELSE 0.0 END)
                   + 0.3 * (CASE WHEN swr >= 0.2 THEN 1.0 WHEN swr >= 0.08 THEN 0.5 ELSE 0.0 END)
                   + 0.2 * greatest(0.0, 1.0 - greatest(0.0, (pr - 0.15) * 4))
                   + 0.2 * (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.3 END) AS q
              FROM m
            ), base AS (
              SELECT source, count(*) AS n_docs, avg(q) AS mean_quality,
                     count(DISTINCT text) AS n_distinct
              FROM qv GROUP BY source
            ), lc AS (
              SELECT source, lang, count(*) AS n_lang FROM qv GROUP BY source, lang
            ), pur AS (
              SELECT source, max(n_lang)::DOUBLE / sum(n_lang) AS lang_purity
              FROM lc GROUP BY source
            ), rep AS (
              SELECT b.source,
                     0.4 * b.mean_quality
                   + 0.3 * (1.0 - (1.0 - b.n_distinct::DOUBLE / b.n_docs))
                   + 0.3 * p.lang_purity AS reputation
              FROM base b JOIN pur p USING (source)
            )
            SELECT d.doc_id, d.source, round(r.reputation, 6) AS reputation
            FROM documents d JOIN rep r USING (source)
            WHERE r.reputation >= 0.68
            ORDER BY d.doc_id
        """,
        "bpe_pairs": f"""
            WITH w AS (SELECT doc_id, {words} AS words FROM documents),
            wf AS (
              SELECT word, count(*)::BIGINT AS n
              FROM (SELECT unnest(words) AS word FROM w) GROUP BY word
            ),
            sy AS (
              SELECT word, n, list_append(string_split(word, ''), '</w>') AS syms
              FROM wf
            ),
            pr AS (
              SELECT n, syms[i] AS a, syms[i+1] AS b
              FROM sy, unnest(generate_series(1, len(syms) - 1)) AS t(i)
              WHERE len(syms) >= 2
            )
            SELECT a, b, sum(n)::BIGINT AS count
            FROM pr GROUP BY a, b
            ORDER BY count DESC, a ASC, b ASC
            LIMIT 50
        """,
        "hash_embed": f"""
            WITH dt AS (
              SELECT doc_id,
                     unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> len(t) > 2)) AS t
              FROM documents
            ),
            dh AS (
              SELECT doc_id,
                     ('0x' || substr(md5(t), 1, 8))::BIGINT % 16 AS b,
                     CASE WHEN substr(md5(t), 9, 1) IN
                          ('0','1','2','3','4','5','6','7')
                          THEN 1.0 ELSE -1.0 END AS s
              FROM dt
            ),
            dv AS (SELECT doc_id, b, sum(s) AS v FROM dh GROUP BY doc_id, b),
            dn AS (SELECT doc_id, sqrt(sum(v*v)) AS n FROM dv GROUP BY doc_id),
            grid AS (
              SELECT d.doc_id, s.i
              FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
              CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) s
            ),
            vals AS (
              SELECT g.doc_id, g.i,
                     CASE WHEN coalesce(dn.n, 0) > 0
                          THEN round(coalesce(dv.v, 0) / dn.n, 6)
                          ELSE 0.0 END AS x
              FROM grid g
              LEFT JOIN dv ON dv.doc_id = g.doc_id AND dv.b = g.i
              LEFT JOIN dn ON dn.doc_id = g.doc_id
            )
            SELECT doc_id, list(x ORDER BY i) AS embedding
            FROM vals GROUP BY doc_id ORDER BY doc_id
        """,
        "embedding_coverage": _EMBEDDING_COVERAGE_SQL,
        "embedding_shape": _embedding_shape_sql(),
        "embedding_select": _embedding_select_sql(),
        "quality_quantiles": """
            WITH w AS (
              SELECT doc_id, lang, text,
                     list_filter(string_split_regex(lower(text), '[^a-zA-Zà-ÿä-üá-ú]+'), x -> x != '') AS lw,
                     list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS words
              FROM documents
            ), m AS (
              SELECT doc_id, lang, text, words,
                     CASE WHEN len(lw) > 0 THEN
                       len(list_filter(lw, x -> x IN ('the','and','of','to','in','is','that','it','for','with','was','on')))::DOUBLE / len(lw)
                     ELSE 0.0 END AS swr,
                     CASE WHEN length(text) > 0
                          THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE / length(text)
                          ELSE 0.0 END AS pr,
                     CASE WHEN len(words) > 0
                          THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words)
                          ELSE 0.0 END AS mwl
              FROM w
            ), qv AS (
              SELECT lang,
                     0.3 * (CASE WHEN length(text) >= 200 THEN 1.0 WHEN length(text) >= 50 THEN 0.5 ELSE 0.0 END)
                   + 0.3 * (CASE WHEN swr >= 0.2 THEN 1.0 WHEN swr >= 0.08 THEN 0.5 ELSE 0.0 END)
                   + 0.2 * greatest(0.0, 1.0 - greatest(0.0, (pr - 0.15) * 4))
                   + 0.2 * (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.3 END) AS q
              FROM m
            )
            SELECT lang, count(*) AS n_docs,
                   round(quantile_cont(q, 0.5), 6) AS p50,
                   round(quantile_cont(q, 0.9), 6) AS p90,
                   round(avg(q), 6) AS mean_q
            FROM qv GROUP BY lang ORDER BY lang
        """,
        "gopher_repetition": """
            WITH base AS (
              SELECT doc_id,
                     list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS ls,
                     list_filter(string_split_regex(trim(text), '\\s+'), w -> w != '') AS ws
              FROM documents
            ), tot AS (
              SELECT doc_id, len(ls) AS n_lines,
                     coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS totc
              FROM base
            ), lx AS (
              SELECT doc_id, unnest(ls) AS ln FROM base
            ), lc AS (
              SELECT doc_id, ln, count(*) AS c, length(ln) AS chars FROM lx GROUP BY doc_id, ln
            ), lagg AS (
              SELECT doc_id, sum(c) AS nl, sum(c) - count(*) AS dupn,
                     sum((c - 1) * chars) AS dupch, sum(c * chars) AS totch
              FROM lc GROUP BY doc_id
            ), g2 AS (
              SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                     j -> array_to_string(list_slice(ws, j, j + 1), ' '))) AS ng FROM base
            ), c2 AS (
              SELECT doc_id, ng, count(*) AS c, length(ng) - 1 AS chars FROM g2 GROUP BY doc_id, ng
            ), t2 AS (SELECT doc_id, max(c) AS maxc FROM c2 GROUP BY doc_id
            ), top2 AS (
              SELECT c2.doc_id, CASE WHEN t2.maxc >= 2 THEN t2.maxc * max(c2.chars) ELSE 0 END AS cov
              FROM c2 JOIN t2 ON c2.doc_id = t2.doc_id AND c2.c = t2.maxc
              GROUP BY c2.doc_id, t2.maxc
            ), g3 AS (
              SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 2),
                     j -> array_to_string(list_slice(ws, j, j + 2), ' '))) AS ng FROM base
            ), c3 AS (
              SELECT doc_id, ng, count(*) AS c, length(ng) - 2 AS chars FROM g3 GROUP BY doc_id, ng
            ), t3 AS (SELECT doc_id, max(c) AS maxc FROM c3 GROUP BY doc_id
            ), top3 AS (
              SELECT c3.doc_id, CASE WHEN t3.maxc >= 2 THEN t3.maxc * max(c3.chars) ELSE 0 END AS cov
              FROM c3 JOIN t3 ON c3.doc_id = t3.doc_id AND c3.c = t3.maxc
              GROUP BY c3.doc_id, t3.maxc
            ), g5 AS (
              SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 4),
                     j -> array_to_string(list_slice(ws, j, j + 4), ' '))) AS ng FROM base
            ), c5 AS (
              SELECT doc_id, ng, count(*) AS c, length(ng) - 4 AS chars FROM g5 GROUP BY doc_id, ng
            ), d5 AS (
              SELECT doc_id, sum((c - 1) * chars) AS dup FROM c5 WHERE c > 1 GROUP BY doc_id
            ), g10 AS (
              SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 9),
                     j -> array_to_string(list_slice(ws, j, j + 9), ' '))) AS ng FROM base
            ), c10 AS (
              SELECT doc_id, ng, count(*) AS c, length(ng) - 9 AS chars FROM g10 GROUP BY doc_id, ng
            ), d10 AS (
              SELECT doc_id, sum((c - 1) * chars) AS dup FROM c10 WHERE c > 1 GROUP BY doc_id
            )
            SELECT t.doc_id, t.n_lines,
                   round(coalesce(la.dupn::DOUBLE / la.nl, 0), 6) AS dup_line_frac,
                   round(coalesce(CASE WHEN la.totch > 0 THEN la.dupch::DOUBLE / la.totch END, 0), 6) AS dup_line_char_frac,
                   round(coalesce(CASE WHEN t.totc > 0 THEN top2.cov::DOUBLE / t.totc END, 0), 6) AS top_2gram_char_frac,
                   round(coalesce(CASE WHEN t.totc > 0 THEN top3.cov::DOUBLE / t.totc END, 0), 6) AS top_3gram_char_frac,
                   round(coalesce(CASE WHEN t.totc > 0 THEN d5.dup::DOUBLE / t.totc END, 0), 6) AS dup_5gram_char_frac,
                   round(coalesce(CASE WHEN t.totc > 0 THEN d10.dup::DOUBLE / t.totc END, 0), 6) AS dup_10gram_char_frac
            FROM tot t
            LEFT JOIN lagg la USING (doc_id)
            LEFT JOIN top2 USING (doc_id)
            LEFT JOIN top3 USING (doc_id)
            LEFT JOIN d5 USING (doc_id)
            LEFT JOIN d10 USING (doc_id)
            ORDER BY doc_id
        """,
        "gopher_quality": """
            WITH base AS (
              SELECT doc_id, text,
                     list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS ls,
                     list_filter(string_split_regex(trim(text), '\\s+'), w -> w != '') AS ws
              FROM documents
            ), m AS (
              SELECT doc_id,
                     len(ws) AS nw,
                     CASE WHEN len(ws) > 0 THEN list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws) ELSE 0.0 END AS mwl,
                     length(text) - length(replace(text, '#', '')) + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS nsym,
                     CASE WHEN len(ls) > 0 THEN len(list_filter(ls, l -> regexp_matches(trim(l), '^[-*•‣▪]')))::DOUBLE / len(ls) ELSE 0.0 END AS bullet,
                     CASE WHEN len(ls) > 0 THEN len(list_filter(ls, l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))::DOUBLE / len(ls) ELSE 0.0 END AS ell,
                     CASE WHEN len(ws) > 0 THEN len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE / len(ws) ELSE 0.0 END AS alpha,
                     len(list_intersect(list_distinct(list_transform(ws, w -> lower(w))),
                         ['the','be','to','of','and','that','have','with'])) AS stops
              FROM base
            )
            SELECT doc_id,
                   (nw >= 50 AND nw <= 100000) AS ok_word_count,
                   (mwl >= 3.0 AND mwl <= 10.0) AS ok_mean_word_len,
                   CASE WHEN nw > 0 THEN nsym::DOUBLE / nw <= 0.1 ELSE FALSE END AS ok_symbol_ratio,
                   (bullet <= 0.9) AS ok_bullet_lines,
                   (ell <= 0.3) AS ok_ellipsis_lines,
                   (alpha >= 0.8) AS ok_alpha_words,
                   (stops >= 2) AS ok_stop_words,
                   ((nw >= 50 AND nw <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
                    AND (CASE WHEN nw > 0 THEN nsym::DOUBLE / nw <= 0.1 ELSE FALSE END)
                    AND bullet <= 0.9 AND ell <= 0.3 AND alpha >= 0.8 AND stops >= 2) AS passes
            FROM m ORDER BY doc_id
        """,
        "c4_rules": """
            WITH base AS (
              SELECT doc_id,
                     list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS ls,
                     contains(lower(text), 'lorem ipsum') AS lorem,
                     contains(text, '{') AS brace
              FROM documents
            ), k AS (
              SELECT doc_id, ls, lorem, brace,
                     list_filter(ls, l -> regexp_matches(trim(l), '[.!?"”»]$')
                        AND len(list_filter(string_split_regex(trim(l), '\\s+'), w -> w != '')) >= 3
                        AND NOT contains(lower(trim(l)), 'javascript')) AS kept
              FROM base
            ), s AS (
              SELECT doc_id, ls, lorem, brace, kept,
                     len(regexp_extract_all(coalesce(array_to_string(kept, chr(10)), ''), '[.!?]')) AS n_sent
              FROM k
            )
            SELECT doc_id, len(ls) AS n_lines, len(kept) AS n_kept_lines,
                   n_sent AS n_sentences, lorem AS has_lorem_ipsum, brace AS has_brace,
                   (n_sent >= 5 AND NOT lorem AND NOT brace) AS keep_doc
            FROM s ORDER BY doc_id
        """,
        "cross_doc_dup": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                                 x -> x != '') AS words
              FROM documents
            ), tot AS (
              SELECT doc_id, coalesce(list_sum(list_transform(words, x -> length(x))), 0) AS wchars
              FROM w
            ), g AS (
              SELECT doc_id, unnest(list_transform(generate_series(1, len(words) - 4),
                     j -> array_to_string(list_slice(words, j, j + 4), ' '))) AS ng
              FROM w
            ), pg AS (
              SELECT doc_id, ng, count(*) AS cnt, length(ng) - 4 AS chars
              FROM g GROUP BY doc_id, ng
            ), df AS (
              SELECT ng, count(*) AS ndocs FROM pg GROUP BY ng
            ), agg AS (
              SELECT pg.doc_id,
                     sum(pg.cnt) AS n_grams,
                     sum(CASE WHEN df.ndocs >= 2 THEN pg.cnt ELSE 0 END) AS n_dup_grams,
                     sum(CASE WHEN df.ndocs >= 2 THEN pg.cnt * pg.chars ELSE 0 END) AS dupch
              FROM pg JOIN df USING (ng) GROUP BY pg.doc_id
            )
            SELECT t.doc_id,
                   coalesce(a.n_grams, 0)::INT AS n_grams,
                   coalesce(a.n_dup_grams, 0)::INT AS n_dup_grams,
                   round(coalesce(CASE WHEN t.wchars > 0 THEN a.dupch::DOUBLE / t.wchars END, 0), 6) AS dup_gram_char_frac
            FROM tot t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id
        """,
        "paragraph_dedup": """
            WITH d AS (
              SELECT doc_id,
                     list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS ls
              FROM documents
            ), p AS (
              SELECT doc_id, unnest(list_transform(ls, (x, i) -> {pos: i - 1, para: x})) AS s
              FROM d
            ), r AS (
              SELECT doc_id, s.pos AS pos, s.para AS para,
                     row_number() OVER (
                       PARTITION BY md5(regexp_replace(lower(trim(s.para)), '\\s+', ' ', 'g'))
                       ORDER BY doc_id, s.pos) AS rn
              FROM p
            ), a AS (
              SELECT doc_id, count(*) AS n_paras,
                     sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept,
                     coalesce(array_to_string(list_transform(
                       list_sort(list({pos: pos, para: para}) FILTER (WHERE rn = 1)),
                       s -> s.para), chr(10)), '') AS text_dedup
              FROM r GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(a.n_paras, 0)::INT AS n_paras,
                   coalesce(a.n_kept, 0)::INT AS n_kept,
                   coalesce(a.text_dedup, '') AS text_dedup
            FROM d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id
        """,
        "curation_report": f"""
            WITH RECURSIVE w AS (SELECT doc_id, {words} AS words FROM documents),
            sh AS (
              SELECT doc_id, unnest(CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(words)-2),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) END) AS shingle
              FROM w
            ), sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            sig AS (
              SELECT doc_id, perm, min(md5(shingle || '#p' || perm::VARCHAR)) AS minhash
              FROM sh, (SELECT unnest(generate_series(0, 7)) AS perm)
              GROUP BY doc_id, perm
            ), banded AS (
              SELECT doc_id, perm // 2 AS band,
                     array_to_string(list_sort(list(minhash)), '|') AS band_key
              FROM sig GROUP BY doc_id, perm // 2
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM banded x JOIN banded y ON x.band = y.band AND x.band_key = y.band_key
              WHERE x.doc_id < y.doc_id
            ),
            inter AS (
              SELECT c.a, c.b, count(*) AS i
              FROM cand c
              JOIN sh sx ON sx.doc_id = c.a
              JOIN sh sy ON sy.doc_id = c.b AND sy.shingle = sx.shingle
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT a, b
              FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
              WHERE i / (sa.n_sh + sb.n_sh - i) >= 0.12
            ),
            sym AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
            reach(u, v) AS (
              SELECT u, v FROM sym
              UNION
              SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
            ),
            comp AS (
              SELECT d.doc_id,
                     least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
              FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
              GROUP BY d.doc_id
            ),
            cs AS (SELECT cluster_id, count(*)::INT AS cluster_size FROM comp GROUP BY cluster_id),
            qb AS (
              SELECT doc_id, text,
                     list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS ls,
                     list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS ws
              FROM documents
            ), qm AS (
              SELECT doc_id,
                     len(ws) AS nw,
                     CASE WHEN len(ws) > 0 THEN list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws) ELSE 0.0 END AS mwl,
                     length(text) - length(replace(text, '#', '')) + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS nsym,
                     CASE WHEN len(ls) > 0 THEN len(list_filter(ls, l -> regexp_matches(trim(l), '^[-*•‣▪]')))::DOUBLE / len(ls) ELSE 0.0 END AS bullet,
                     CASE WHEN len(ls) > 0 THEN len(list_filter(ls, l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))::DOUBLE / len(ls) ELSE 0.0 END AS ell,
                     CASE WHEN len(ws) > 0 THEN len(list_filter(ws, w2 -> regexp_matches(w2, '[A-Za-z]')))::DOUBLE / len(ws) ELSE 0.0 END AS alpha,
                     len(list_intersect(list_distinct(list_transform(ws, w2 -> lower(w2))),
                         ['the','be','to','of','and','that','have','with'])) AS stops,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                     len(regexp_extract_all(coalesce(array_to_string(
                       list_filter(ls, l -> regexp_matches(trim(l), '[.!?"”»]$')
                          AND len(list_filter(string_split_regex(trim(l), '\\s+'), w2 -> w2 != '')) >= 3
                          AND NOT contains(lower(trim(l)), 'javascript')), chr(10)), ''), '[.!?]')) AS n_sent,
                     contains(lower(text), 'lorem ipsum') AS lorem,
                     contains(text, '{{') AS brace,
                     md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS chash
              FROM qb
            ), ex AS (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY chash ORDER BY doc_id) = 1 AS exact_canonical
              FROM qm
            )
            SELECT q.doc_id, q.n_tokens::INT AS n_tokens,
                   (q.n_tokens >= 20) AS ok_len,
                   ((q.nw >= 50 AND q.nw <= 100000) AND (q.mwl >= 3.0 AND q.mwl <= 10.0)
                    AND (CASE WHEN q.nw > 0 THEN q.nsym::DOUBLE / q.nw <= 0.1 ELSE FALSE END)
                    AND q.bullet <= 0.9 AND q.ell <= 0.3 AND q.alpha >= 0.8 AND q.stops >= 2) AS gopher_passes,
                   (q.n_sent >= 5 AND NOT q.lorem AND NOT q.brace) AS c4_keep,
                   ex.exact_canonical,
                   comp.cluster_id, cs.cluster_size,
                   (q.doc_id = comp.cluster_id) AS neardup_canonical,
                   ((q.n_tokens >= 20) AND ex.exact_canonical AND q.doc_id = comp.cluster_id) AS kept
            FROM qm q
            JOIN ex USING (doc_id)
            JOIN comp ON comp.doc_id = q.doc_id
            JOIN cs USING (cluster_id)
            ORDER BY q.doc_id
        """,
        "pack_sequences": """
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                     ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0 AS u01,
                     (('0x' || substr(md5(doc_id::VARCHAR), 9, 8))::BIGINT % 8)::INT AS bucket
              FROM documents
            ), c AS (
              SELECT *, sum(n_tokens) OVER (
                PARTITION BY bucket ORDER BY u01, doc_id ROWS UNBOUNDED PRECEDING) AS cum
              FROM t
            )
            SELECT doc_id, bucket, (cum - n_tokens) AS start_offset,
                   bucket::BIGINT * 4294967296 + ((cum - n_tokens) // 512) AS seq_id,
                   n_tokens
            FROM c ORDER BY doc_id
        """,
        "pack_stats": """
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                     ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0 AS u01,
                     (('0x' || substr(md5(doc_id::VARCHAR), 9, 8))::BIGINT % 8)::INT AS bucket
              FROM documents
            ), c AS (
              SELECT *, sum(n_tokens) OVER (
                PARTITION BY bucket ORDER BY u01, doc_id ROWS UNBOUNDED PRECEDING) AS cum
              FROM t
            ), p AS (
              SELECT bucket::BIGINT * 4294967296 + ((cum - n_tokens) // 512) AS seq_id,
                     n_tokens
              FROM c
            )
            SELECT seq_id, count(*)::INT AS n_docs, sum(n_tokens) AS tokens_started,
                   round(sum(n_tokens) / 512.0, 6) AS fill_ratio
            FROM p GROUP BY seq_id ORDER BY seq_id
        """,
        "pii_redact": """
            WITH p AS (
              SELECT doc_id, text,
                     'contact user' || doc_id::VARCHAR || '@example.com at 10.0.' ||
                     (doc_id % 256)::VARCHAR || '.7 or 555-' ||
                     lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-1234 ok' AS sfx
              FROM documents
            ), f AS (
              SELECT doc_id, sfx, text || ' ' || sfx AS t0 FROM p
            ), r1 AS (
              SELECT doc_id, sfx,
                     len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
                     regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
              FROM f
            ), r2 AS (
              SELECT doc_id, sfx, n_email,
                     len(regexp_extract_all(t1, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ip,
                     regexp_replace(t1, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g') AS t2
              FROM r1
            ), r3 AS (
              SELECT doc_id, sfx, n_email, n_ip,
                     len(regexp_extract_all(t2, '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b')) AS n_phone
              FROM r2
            )
            SELECT doc_id, n_email, n_ip, n_phone,
                   regexp_replace(regexp_replace(regexp_replace(sfx,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                     '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
                     '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b', '<PHONE>', 'g') AS redacted_suffix
            FROM r3 ORDER BY doc_id
        """,
        "vocab_coverage": """
            WITH w AS (
              SELECT unnest(list_filter(string_split(
                regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                x -> x != '')) AS word
              FROM documents
            ), c AS (
              SELECT word, count(*) AS cnt FROM w GROUP BY word
            ), tot AS (SELECT sum(cnt) AS total FROM c),
            k AS (
              SELECT word, cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rank
              FROM c QUALIFY rank <= 50
            ), s AS (
              SELECT word, cnt, rank,
                     sum(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS cum
              FROM k
            )
            SELECT word, cnt, rank::INT AS rank,
                   round(cum / (SELECT total FROM tot), 6) AS coverage
            FROM s ORDER BY rank
        """,
        "sample_stratified": """
            WITH u AS (
              SELECT doc_id, lang,
                     ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0 AS u01
              FROM documents
            )
            SELECT doc_id, lang, round(u01, 6) AS u01 FROM u
            WHERE u01 < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                                  WHEN 'fr' THEN 0.1 ELSE 0.0 END
            ORDER BY doc_id
        """,
        "mixture_weights": """
            WITH c AS (
              SELECT source, count(*)::BIGINT AS n_docs,
                     pow(count(*), 0.5) AS pw
              FROM documents GROUP BY source
            ), t AS (
              SELECT sum(n_docs)::DOUBLE AS n_total, sum(pw) AS pw_total FROM c
            )
            SELECT source, n_docs,
                   round(n_docs / n_total, 6) AS nat_share,
                   round(pw / pw_total, 6) AS target_share,
                   round(least(1.0, 200.0 * (pw / pw_total) / n_docs), 6) AS rate
            FROM c CROSS JOIN t
            ORDER BY source
        """,
        "mixture_sample": """
            WITH c AS (
              SELECT source, count(*)::BIGINT AS n_docs,
                     pow(count(*), 0.5) AS pw
              FROM documents GROUP BY source
            ), t AS (
              SELECT sum(pw) AS pw_total FROM c
            ), r AS (
              SELECT source, least(1.0, 200.0 * (pw / pw_total) / n_docs) AS rate
              FROM c CROSS JOIN t
            ), u AS (
              SELECT d.doc_id, d.source, r.rate,
                     ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0 AS u01
              FROM documents d JOIN r USING (source)
            )
            SELECT doc_id, source, round(u01, 6) AS u01
            FROM u WHERE u01 < rate ORDER BY doc_id
        """,
        "sample_budget": """
            WITH t AS (
              SELECT doc_id, lang,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                     ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0 AS u01
              FROM documents
            ), b AS (
              SELECT *, CASE lang WHEN 'en' THEN 2000.0 WHEN 'de' THEN 1000.0 END AS budget
              FROM t WHERE lang IN ('en', 'de')
            ), c AS (
              SELECT *, sum(n_tokens) OVER (
                PARTITION BY lang ORDER BY u01, doc_id ROWS UNBOUNDED PRECEDING) AS cum
              FROM b
            )
            SELECT doc_id, lang, n_tokens, cum AS cum_weight, round(u01, 6) AS u01
            FROM c WHERE cum - n_tokens < budget ORDER BY doc_id
        """,
        "media_decode": """
            WITH m AS (SELECT 'm' || doc_id::VARCHAR AS media_id, text, md5(text) AS hx FROM documents)
            SELECT media_id,
                   64 + ('0x' || substr(hx, 1, 2))::INT * 4 AS width,
                   64 + ('0x' || substr(hx, 3, 2))::INT * 4 AS height,
                   length(text)::BIGINT AS n_bytes,
                   round((('0x' || substr(hx, 1, 2))::INT / 255.0), 6) AS f0,
                   round((('0x' || substr(hx, 31, 2))::INT / 255.0), 6) AS f15
            FROM m ORDER BY media_id
        """,
        "pdf_extract": """
            SELECT doc_id, 1 AS page_number,
                   length(text)::BIGINT AS n_chars,
                   md5(text) AS raw_md5
            FROM documents ORDER BY doc_id
        """,
        "revisit_priority": """
            WITH h AS (
              SELECT user_id AS page_id, ts, event_id,
                     floor(value / 50)::BIGINT AS sig
              FROM events
            ), c AS (
              SELECT page_id, ts, sig,
                     CASE WHEN lag(sig) OVER w IS NOT NULL
                           AND sig <> lag(sig) OVER w THEN 1 ELSE 0 END AS chg
              FROM h WINDOW w AS (PARTITION BY page_id ORDER BY ts, event_id)
            ), per AS (
              SELECT page_id, count(*) AS n_obs, sum(chg) AS n_changes,
                     floor(date_part('epoch', min(ts)))::BIGINT AS f,
                     floor(date_part('epoch', max(ts)))::BIGINT AS l
              FROM c GROUP BY page_id
            ), nw AS (
              SELECT floor(date_part('epoch', max(ts)))::BIGINT AS now_s FROM events
            )
            SELECT page_id, n_obs, n_changes,
                   round(CASE WHEN n_obs >= 2 AND l > f
                     THEN -ln((n_obs - n_changes + 0.5) / (n_obs + 0.5))
                          / ((l - f) / (n_obs - 1.0)) * 1000000 END, 6) AS rate_e6,
                   round(CASE WHEN n_obs >= 2 AND l > f
                     THEN 1.0 - exp(ln((n_obs - n_changes + 0.5) / (n_obs + 0.5))
                                    / ((l - f) / (n_obs - 1.0)) * (now_s - l))
                     ELSE 0.0 END, 6) AS staleness
            FROM per, nw ORDER BY page_id
        """,
        "warc_roundtrip": """
            SELECT doc_id,
                   'http://docs.test/' || doc_id::VARCHAR AS url,
                   octet_length(encode(text))::BIGINT AS n_bytes,
                   md5(text) AS payload_md5
            FROM documents ORDER BY doc_id
        """,
        "video_frames": """
            SELECT doc_id, frame_idx FROM (
              SELECT doc_id,
                     unnest(generate_series(0, (length(text) // 50 + 1) - 1, 3)) AS frame_idx
              FROM documents
            ) ORDER BY doc_id, frame_idx
        """,
        "regex_entities": """
            SELECT label, count(*) AS n_matches FROM (
              SELECT unnest(['email','currency','percentage','date_iso']) AS label
            ), documents
            GROUP BY label ORDER BY label
        """,
        "window_chunks": f"""
            WITH w AS (SELECT doc_id, {words} AS words FROM documents),
            ch AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(0, greatest(cast(ceil((len(words) - 5) / 15.0) AS INT) - 1, 0)),
                       j -> {{'j': j, 'l': length(array_to_string(words[j*15+1 : j*15+20], ' '))}}) AS chunks
              FROM w
            ), e AS (
              SELECT doc_id, chunks, unnest(generate_series(1, len(chunks))) AS idx FROM ch
            )
            SELECT doc_id, (idx - 1)::INT AS chunk_idx, chunks[idx].l AS chunk_len
            FROM e ORDER BY doc_id, chunk_idx
        """,
        "table_extract": """
            SELECT doc_id, 'value' AS h2, doc_id::VARCHAR AS id_cell,
                   lang AS lang_cell, 9 AS score
            FROM documents ORDER BY doc_id
        """,
        "bm25_rank": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')) AS term
              FROM documents
            ), dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
            stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                             (SELECT avg(dl) FROM dl) AS avgdl),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks
              WHERE term IN ('spark','window','batch') GROUP BY doc_id, term
            ), dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum(ln((stats.n - dfreq.df + 0.5)/(dfreq.df + 0.5) + 1.0)
                         * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS bm25
              FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
              GROUP BY tf.doc_id
            ), full_scored AS (
              SELECT d.doc_id, coalesce(s.bm25, 0.0) AS bm25
              FROM documents d LEFT JOIN scored s USING (doc_id)
            ), mm AS (SELECT min(bm25) AS lo, max(bm25) AS hi FROM full_scored)
            SELECT doc_id,
                   round(CASE WHEN mm.hi - mm.lo < 1e-12 THEN 0.5
                              ELSE (bm25 - mm.lo)/(mm.hi - mm.lo) END, 6) AS relevance
            FROM full_scored, mm
            ORDER BY relevance DESC, doc_id ASC LIMIT 50
        """,
        "term_stats": """
            SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df FROM (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')) AS term
              FROM documents
            ) GROUP BY term ORDER BY tf DESC, term ASC LIMIT 30
        """,
        "adaptive_rank": """
            WITH tok AS (
              SELECT doc_id,
                     list_distinct(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> length(x) > 2)) AS pt
              FROM documents
            ),
            kbt AS (
              SELECT DISTINCT unnest(pt) AS term FROM tok WHERE doc_id % 4 = 0
            ),
            links AS (SELECT * FROM tok WHERE doc_id % 4 != 0),
            novel AS (
              SELECT l.doc_id, count(*) AS n_new
              FROM (SELECT doc_id, unnest(pt) AS term FROM links) l
              ANTI JOIN kbt USING (term)
              GROUP BY l.doc_id
            )
            SELECT links.doc_id,
                   round(len(list_intersect(pt,
                     ['frontier','join','shuffle','spark','window']))/5.0, 6)
                     AS relevance,
                   round(CASE WHEN len(pt) = 0 THEN 0.5
                         ELSE coalesce(n_new, 0)::DOUBLE / len(pt) END, 6)
                     AS novelty,
                   round(CASE links.doc_id % 3
                         WHEN 0 THEN 0.8    -- /docs/ +0.2, /guide/ +0.1
                         WHEN 1 THEN 0.7    -- /api/ +0.2
                         ELSE 0.2 END, 6)   -- .png image −0.3
                     AS authority,
                   round(0.5 * (len(list_intersect(pt,
                           ['frontier','join','shuffle','spark','window']))/5.0)
                       + 0.3 * (CASE WHEN len(pt) = 0 THEN 0.5
                                ELSE coalesce(n_new, 0)::DOUBLE / len(pt) END)
                       + 0.2 * (CASE links.doc_id % 3 WHEN 0 THEN 0.8
                                WHEN 1 THEN 0.7 ELSE 0.2 END), 6)
                     AS adaptive_score
            FROM links LEFT JOIN novel ON links.doc_id = novel.doc_id
            ORDER BY links.doc_id
        """,
        "sitemap_seed": """
            SELECT source || '.example.test' AS host, count(*) AS n_urls
            FROM documents GROUP BY source ORDER BY host
        """,
        "head_parse": """
            SELECT doc_id, 'Doc ' || doc_id::VARCHAR AS title,
                   lang AS html_lang,
                   'about ' || source AS description
            FROM documents ORDER BY doc_id
        """,
        "fit_markdown": f"""
            SELECT doc_id, length({_NORM_SQL.replace("lower(trim(text))", "trim(text)")}) AS fit_len,
                   false AS has_nav_leak
            FROM documents ORDER BY doc_id
        """,
        "bm25_fit": """
            SELECT doc_id,
                   '<div><p>zzfrontierzz zzcrawlzz doc ' || doc_id::VARCHAR
                     || ' from ' || source || '</p></div>' AS fit_html,
                   'zzfrontierzz zzcrawlzz doc ' || doc_id::VARCHAR
                     || ' from ' || source AS fit_md
            FROM documents ORDER BY doc_id
        """,
        "css_extract": r"""
            SELECT doc_id::VARCHAR AS pid,
                   'Doc ' || doc_id::VARCHAR AS title,
                   lower(lang) AS lang_lc,
                   trim(substr(regexp_replace(text, '[<>&"\s]+', ' ', 'g'), 1, 120)) AS body,
                   'https://ex.test/' || source || '/' || doc_id::VARCHAR AS href,
                   doc_id::VARCHAR AS num
            FROM documents ORDER BY doc_id
        """,
        "link_scores": (lambda e: f"""
            WITH v AS (
              SELECT doc_id,
                     CASE doc_id % 4 WHEN 0 THEN {e[0]} WHEN 1 THEN {e[1]}
                          WHEN 2 THEN {e[2]} ELSE {e[3]} END AS intrinsic,
                     (doc_id % 10) / 10.0 AS ctx
              FROM documents
            )
            SELECT doc_id, intrinsic,
                   round(greatest(0.0, least(intrinsic * 0.7
                         + least(ctx * 10.0, 10.0) * 0.3, 10.0)), 6) AS total
            FROM v ORDER BY doc_id
        """)(_ls_expected()),
        "seo_score": (lambda e: f"""
            SELECT doc_id,
                   CASE doc_id % 3 WHEN 0 THEN {e[0]} WHEN 1 THEN {e[1]}
                        ELSE {e[2]} END AS seo
            FROM documents ORDER BY doc_id
        """)(_seo_expected()),
        "relevance_score": (lambda e: f"""
            SELECT doc_id,
                   CASE doc_id % 3 WHEN 0 THEN {e[0]} WHEN 1 THEN {e[1]}
                        ELSE {e[2]} END AS rel
            FROM documents ORDER BY doc_id
        """)(_rel_expected()),
        "filter_stats": f"""
            WITH u AS (SELECT {url} AS url FROM documents)
            SELECT 'en_pages' AS filter, count(*)::BIGINT AS total,
                   sum(CASE WHEN url LIKE '%.example.test/en/%' THEN 1 ELSE 0 END)::BIGINT AS passed,
                   (count(*) - sum(CASE WHEN url LIKE '%.example.test/en/%' THEN 1 ELSE 0 END))::BIGINT AS rejected
            FROM u
            UNION ALL
            SELECT 'typed_docs', count(*)::BIGINT,
                   sum(CASE WHEN url LIKE '%.html%' OR url LIKE '%.pdf%' THEN 1 ELSE 0 END)::BIGINT,
                   (count(*) - sum(CASE WHEN url LIKE '%.html%' OR url LIKE '%.pdf%' THEN 1 ELSE 0 END))::BIGINT
            FROM u
            ORDER BY filter
        """,
        "scoring_stats": """
            WITH s AS (SELECT (doc_id % 100) / 100.0 AS score FROM documents)
            SELECT count(score)::BIGINT AS urls_scored,
                   round(coalesce(sum(score), 0.0), 6) AS total_score,
                   round(min(score), 6) AS min_score,
                   round(max(score), 6) AS max_score,
                   round(coalesce(avg(score), 0.0), 6) AS average_score
            FROM s
        """,
        "match_config": f"""
            WITH u AS (SELECT doc_id, {url} AS url FROM documents)
            SELECT doc_id,
                   CASE WHEN url LIKE '%.pdf%' THEN 'pdf'
                        WHEN url LIKE '%/en/%' AND url LIKE '%.html%' THEN 'en_html'
                        ELSE 'default' END AS cfg
            FROM u ORDER BY doc_id
        """,
        "cc_seed": f"""
            WITH u AS (SELECT DISTINCT {url} AS url FROM documents)
            SELECT url FROM u
            WHERE regexp_matches(url, '^https?://([^/]*\\.)?example\\.test(/|$)')
              AND url LIKE '%/en/%'
            ORDER BY url
        """,
        "render_training": f"""
            WITH w AS (SELECT doc_id, {words} AS words FROM documents),
            ch AS (
              SELECT doc_id,
                     list_transform(generate_series(0, cast(ceil(len(words) / 10.0) AS INT) - 1),
                       j -> {{'j': j, 'chunk': array_to_string(words[j*10+1 : j*10+10], ' ')}}) AS chunks
              FROM w
            ), sp AS (
              SELECT doc_id,
                     flatten(list_transform(chunks, s ->
                       CASE WHEN s.j % 3 = 2 THEN
                         [{{'kind': 'text', 'text': s.chunk, 'media_ref': ''}},
                          {{'kind': 'media', 'text': '', 'media_ref': '/img/' || (doc_id % 50)::VARCHAR || '-' || s.j::VARCHAR}}]
                       ELSE [{{'kind': 'text', 'text': s.chunk, 'media_ref': ''}}] END)) AS spans
              FROM ch
            )
            SELECT doc_id,
                   array_to_string(list_transform(spans,
                     s -> CASE WHEN s.kind = 'text' THEN s.text ELSE '<|image|>' END), ' ') AS training_text,
                   list_transform(list_filter(spans, s -> s.kind = 'media'),
                                  s -> s.media_ref) AS media_refs
            FROM sp ORDER BY doc_id
        """,
        "span_integrity": f"""
            WITH w AS (SELECT doc_id, {words} AS words FROM documents),
            ch AS (
              SELECT doc_id,
                     list_transform(generate_series(0, cast(ceil(len(words) / 10.0) AS INT) - 1),
                       j -> {{'j': j, 'chunk': array_to_string(words[j*10+1 : j*10+10], ' ')}}) AS chunks
              FROM w
            ), sp AS (
              SELECT doc_id,
                     flatten(list_transform(chunks, s ->
                       CASE WHEN s.j % 3 = 2 THEN
                         [{{'kind': 'text', 'text': s.chunk, 'media_ref': ''}},
                          {{'kind': 'media', 'text': '', 'media_ref': '/img/' || (doc_id % 50)::VARCHAR || '-' || s.j::VARCHAR}}]
                       ELSE [{{'kind': 'text', 'text': s.chunk, 'media_ref': ''}}] END)) AS spans
              FROM ch
            )
            SELECT doc_id, len(spans)::INT AS n_spans,
                   len(list_filter(spans, s -> s.kind = 'text'))::INT AS n_text,
                   len(list_filter(spans, s -> s.kind = 'media'))::INT AS n_media,
                   coalesce(list_sum(list_transform(spans,
                     s -> CASE WHEN s.kind = 'text' THEN length(s.text) ELSE 0 END)), 0)::INT AS text_chars,
                   TRUE AS offsets_ok
            FROM sp ORDER BY doc_id
        """,
        "media_manifest": f"""
            WITH w AS (SELECT doc_id, {words} AS words FROM documents),
            ch AS (
              SELECT doc_id,
                     list_transform(generate_series(0, cast(ceil(len(words) / 10.0) AS INT) - 1),
                       j -> {{'j': j, 'chunk': array_to_string(words[j*10+1 : j*10+10], ' ')}}) AS chunks
              FROM w
            ), sp AS (
              SELECT doc_id,
                     flatten(list_transform(chunks, s ->
                       CASE WHEN s.j % 3 = 2 THEN
                         ['/img/' || (doc_id % 50)::VARCHAR || '-' || s.j::VARCHAR]
                       ELSE [] END)) AS refs
              FROM ch
            ), m AS (
              SELECT doc_id, unnest(refs) AS media_ref FROM sp
            )
            SELECT media_ref, count(DISTINCT doc_id)::INT AS n_docs, count(*)::INT AS n_uses
            FROM m GROUP BY media_ref ORDER BY media_ref
        """,
        "interleaved_spans": f"""
            WITH w AS (SELECT doc_id, {words} AS words FROM documents),
            ch AS (
              SELECT doc_id,
                     list_transform(generate_series(0, cast(ceil(len(words) / 10.0) AS INT) - 1),
                       j -> {{'j': j, 'chunk': array_to_string(words[j*10+1 : j*10+10], ' ')}}) AS chunks
              FROM w
            ), sp AS (
              SELECT doc_id,
                     flatten(list_transform(chunks, s ->
                       CASE WHEN s.j % 3 = 2 THEN
                         [{{'kind': 'text', 'media_ref': '', 'tl': length(s.chunk)}},
                          {{'kind': 'media', 'media_ref': '/img/' || doc_id::VARCHAR || '-' || s.j::VARCHAR, 'tl': 0}}]
                       ELSE [{{'kind': 'text', 'media_ref': '', 'tl': length(s.chunk)}}] END)) AS spans
              FROM ch
            ), e AS (
              SELECT doc_id, spans, unnest(generate_series(1, len(spans))) AS idx FROM sp
            )
            SELECT doc_id, (idx - 1)::INT AS "offset",
                   spans[idx].kind AS kind,
                   spans[idx].media_ref AS media_ref,
                   spans[idx].tl AS text_len
            FROM e ORDER BY doc_id, "offset"
        """,
    }
