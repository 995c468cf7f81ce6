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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


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
        # is spread uniformly.  One scalar agg rides the loop.
        shipped = (
            ranks.join(outdeg, ranks["vid"] == outdeg["src"], "left_semi")
            .agg(F.sum("rank"))
            .collect()[0][0]
            or 0.0
        )
        dangling = (1.0 - shipped) / n
        ranks = (
            verts.join(contribs, verts["vid"] == contribs["dst"], "left")
            .select(
                "vid",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("vid").alias(id_col), "rank")
