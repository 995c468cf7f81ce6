"""Link-graph analytics: distributed PageRank.

A frontier at 10^10 URLs prioritizes by intrinsic URL scores (the
reference's scorers) plus GRAPH signals; PageRank over the crawl's
(parent_url → url) edges is the canonical one.  Expressed as the
classic Spark dataflow: ranks live in a (vertex, rank) table, each
iteration is one join (ship rank/out-degree along edges) + one keyed
sum — both hash-partitioned by vertex, no driver-side graph, lineage
cut per iteration exactly like `connected_components`.

Semantics pinned for the oracle: uniform init 1/N, damping d,
dangling-vertex mass redistributed uniformly (the standard
power-iteration formulation), FIXED iteration count (deterministic —
convergence thresholds would make the oracle comparison flaky).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pagerank", "bfs_levels", "hits"]


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(id, rank) after `n_iter` power iterations.

    edges: directed (src, dst), duplicates allowed (parallel edges add
    weight, as repeated links on a page do).  vertices: optional id
    universe; defaults to vertices appearing in edges.  Ranks sum to 1
    at every iteration (dangling mass redistributed uniformly).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if vertices is None:
        verts = (
            e.select(F.col("src").alias("vid"))
            .union(e.select(F.col("dst").alias("vid")))
            .distinct()
        )
    else:
        verts = vertices.select(F.col(id_col).alias("vid")).distinct()
    verts = verts.localCheckpoint(eager=True)
    n = verts.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e = e.join(outdeg, "src").localCheckpoint(eager=True)

    ranks = verts.select("vid", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contribs = (
            e.join(ranks, e["src"] == ranks["vid"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling vertices (no out-edges) leak their mass: total
        # shipped = sum of ranks of vertices WITH out-edges; the rest
        # is spread uniformly.  The scalar rides the iteration's one
        # job as a broadcast 1-row aggregate (ranks is checkpointed, so
        # the extra agg re-reads the materialized blocks) — no driver
        # collect / extra job per superstep.
        shipped = ranks.join(
            outdeg, ranks["vid"] == outdeg["src"], "left_semi"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_shipped"))
        ranks = (
            verts.join(contribs, verts["vid"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(shipped))
            .select(
                "vid",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + (F.lit(1.0) - F.col("_shipped")) / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("vid").alias(id_col), "rank")


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    max_depth: int = 10,
) -> DataFrame:
    """(id, depth): shortest hop count from any seed, BFS up to
    `max_depth` — the distributed answer to "how deep is this URL from
    the seed list", the same quantity the crawl engine tracks
    incrementally as `depth` (reference: bfs_strategy.py's level
    bookkeeping) but computed post-hoc over an arbitrary edge table.

    One (frontier ⨝ edges) hash join + distinct + anti-join against the
    visited set per level — the visited set and frontier both carry
    only vertex ids, so each superstep ships 8-byte keys exactly like
    the crawl loop's seen anti-join.  Lineage cut per level.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    frontier = (
        seeds.select(F.col(id_col).alias("vid")).distinct().localCheckpoint(eager=True)
    )
    visited = frontier.select("vid", F.lit(0).alias("depth"))
    for d in range(1, max_depth + 1):
        if frontier.isEmpty():
            break
        nxt = (
            e.join(frontier, e["src"] == frontier["vid"])
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(visited.select("vid"), "vid", "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.union(nxt.select("vid", F.lit(d).alias("depth"))).localCheckpoint(
            eager=True
        )
        frontier = nxt
    return visited.select(F.col("vid").alias(id_col), "depth")


def _l1_normalized(scores: DataFrame) -> DataFrame:
    """Divide `s` by Σs (1.0 if the graph shipped no mass) as a
    broadcast 1-row aggregate riding the same job — no driver collect
    per half-step (an extra full-scan job per superstep at frontier
    scale otherwise)."""
    norm = scores.agg(
        F.when(F.sum("s") > 0, F.sum("s")).otherwise(F.lit(1.0)).alias("_norm")
    )
    return (
        scores.crossJoin(F.broadcast(norm))
        .select("vid", (F.col("s") / F.col("_norm")).alias("s"))
        .localCheckpoint(eager=True)
    )


def hits(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    n_iter: int = 2,
) -> DataFrame:
    """Kleinberg HITS: (id, hub, auth) after `n_iter` rounds, L1
    normalization (scores sum to 1) each half-step — L1 rather than the
    textbook L2 so the oracle SQL stays exact-arithmetic friendly;
    the ranking order is identical under any positive rescaling.

    Same dataflow skeleton as `pagerank`: ship scores along edges with
    one hash join, one keyed sum, one scalar agg for the norm.
    Parallel edges add weight, as repeated links do.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if vertices is None:
        verts = (
            e.select(F.col("src").alias("vid"))
            .union(e.select(F.col("dst").alias("vid")))
            .distinct()
        )
    else:
        verts = vertices.select(F.col(id_col).alias("vid")).distinct()
    verts = verts.localCheckpoint(eager=True)
    e = e.localCheckpoint(eager=True)
    n = verts.count()

    hub = verts.select("vid", F.lit(1.0 / n).alias("s"))
    auth = None
    for _ in range(n_iter):
        # auth(v) = Σ hub(u) over edges u→v, then L1-normalize
        raw_a = (
            e.join(hub, e["src"] == hub["vid"])
            .groupBy("dst")
            .agg(F.sum("s").alias("raw"))
        )
        auth = verts.join(raw_a, verts["vid"] == raw_a["dst"], "left").select(
            "vid", F.coalesce(F.col("raw"), F.lit(0.0)).alias("s")
        )
        auth = _l1_normalized(auth)
        # hub(u) = Σ auth(v) over edges u→v, then L1-normalize
        raw_h = (
            e.join(auth, e["dst"] == auth["vid"])
            .groupBy("src")
            .agg(F.sum("s").alias("raw"))
        )
        hub = verts.join(raw_h, verts["vid"] == raw_h["src"], "left").select(
            "vid", F.coalesce(F.col("raw"), F.lit(0.0)).alias("s")
        )
        hub = _l1_normalized(hub)
    return (
        hub.select("vid", F.col("s").alias("hub"))
        .join(auth.select("vid", F.col("s").alias("auth")), "vid")
        .select(F.col("vid").alias(id_col), "hub", "auth")
    )


def anchor_text_rollup(
    edges: DataFrame,
    dst_col: str = "dst",
    src_col: str = "src",
    anchor_col: str = "anchor",
    top_k: int = 3,
) -> DataFrame:
    """Per-target anchor-text profile — the classic web-ranking signal
    (how OTHERS describe a page): for each link target, its in-link
    count, distinct linking sources, and the top-k anchor terms.

    Output: one row per (dst, term) that survives the top-k cut —
    (dst, n_inlinks, n_sources, term, term_count, rank), rank 1..k by
    (count desc, term asc).

    Scale shape: two keyed aggs (dst stats; (dst, term) counts — both
    combine map-side) and ONE window partitioned by dst for the
    bounded rank — never a global sort; the window's partition is the
    target key, so skew follows in-link skew, which the hub-page cap
    `top_k` bounds on the output side.  Anchor text is tokenized with
    the corpus normalizer so anchor terms join directly against
    document term tables (e.g. BM25 dims).
    """
    from crawl4ai_spark.operators.lm import word_array

    stats = edges.groupBy(dst_col).agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.count_distinct(F.col(src_col)).alias("n_sources"),
    )
    terms = (
        edges.select(F.col(dst_col), F.explode(word_array(anchor_col)).alias("term"))
        .groupBy(dst_col, "term")
        .agg(F.count(F.lit(1)).alias("term_count"))
    )
    w = Window.partitionBy(dst_col).orderBy(F.desc("term_count"), F.asc("term"))
    top = (
        terms.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
    return top.join(stats, dst_col).select(
        dst_col, "n_inlinks", "n_sources", "term", "term_count", "rank"
    )
