"""Duplicate-cluster assembly: connected components over verified
near-duplicate pairs, and the end-to-end dedup-cluster cascade.

A production dedup pipeline does not stop at pairs — it groups the
pair graph into components and keeps ONE canonical document per
component (MinHashLSH dedup as described for Gopher/RefinedWeb-scale
corpora).  This module supplies that last step Spark-first:

- `connected_components` — iterative min-label propagation expressed
  as DataFrame joins.  Each superstep every vertex takes the minimum
  label among itself and its neighbors; convergence in
  diameter-of-component supersteps.  Near-dup graphs are dense,
  shallow clusters (LSH candidates verified by Jaccard form
  near-cliques), so 2-4 supersteps is typical regardless of corpus
  size; the label table is hash-partitioned by vertex and every
  superstep is one keyed join + one keyed min-agg — no driver-side
  graph, no collect.  For adversarial high-diameter graphs swap in a
  star-contraction variant; for dedup workloads propagation is the
  cheaper plan (no edge rewriting).
- `dedup_clusters` — minhash → LSH banding → exact-Jaccard verify →
  connected components → (id, cluster_id, is_canonical, cluster_size),
  with cluster_id = min doc id of the component and the canonical doc
  the one equal to it.  Work stays candidate-bounded end to end.

Scale notes: the propagation join ships (vertex, label) pairs — 16
bytes a row — keyed by vertex hash; edges are re-used as a static,
pre-symmetrized table so only labels move between supersteps.
Lineage is cut with localCheckpoint each superstep (swap for reliable
checkpointing on a real cluster) so plans stay O(1) deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]

from itertools import count as _count

_CC_EPOCH = _count()


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    a_col: str = "a",
    b_col: str = "b",
    id_col: str = "id",
    max_iterations: int = 50,
) -> DataFrame:
    """Label every vertex with the minimum vertex id reachable from it.

    edges: (a, b) undirected pairs (any orientation, dups fine).
    vertices: optional (id) universe — isolated vertices come out as
    their own singleton component; defaults to the vertices present in
    `edges`.  Returns (id, component).
    """
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    ).localCheckpoint(eager=True)
    active = sym.select(F.col("src").alias("vid")).distinct()
    # Only vertices with an edge iterate: in a dedup corpus the vast
    # majority of docs are isolated and must not ride (or be shuffled
    # by) every propagation superstep — they are appended as singleton
    # components at the end.
    isolated = None
    if vertices is not None:
        isolated = vertices.select(F.col(id_col).alias("vid")).join(
            active, "vid", "left_anti"
        )
    labels = active.select("vid", F.col("vid").alias("component"))
    labels = labels.localCheckpoint(eager=True)

    from pyspark.sql import Observation

    epoch = next(_CC_EPOCH)
    for it in range(max_iterations):
        nbr_min = (
            labels.join(sym, labels["vid"] == sym["src"])
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = labels.join(nbr_min, labels["vid"] == nbr_min["dst"], "left").select(
            "vid",
            "component",
            F.least("component", F.coalesce("nbr_min", "component")).alias("new_component"),
        )
        # the convergence check rides the checkpoint job as an observe()
        # metric — one Spark job per superstep, not two (same pattern as
        # the crawl engine's superstep counters)
        obs = Observation(f"cc_{epoch}_{it}")
        stepped = stepped.observe(
            obs,
            F.sum((F.col("new_component") < F.col("component")).cast("long")).alias("changed"),
        ).localCheckpoint(eager=True)
        changed = obs.get["changed"]
        labels = stepped.select("vid", F.col("new_component").alias("component"))
        if not changed:
            break
    if isolated is not None:
        labels = labels.union(isolated.select("vid", F.col("vid").alias("component")))
    return labels.select(F.col("vid").alias(id_col), "component")


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """End-to-end near-dup clustering: the minhash→LSH→Jaccard cascade
    to verified pairs, then connected components.  Returns one row per
    input doc: (id, cluster_id, is_canonical, cluster_size)."""
    from crawl4ai_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signature,
    )

    sig = minhash_signature(df, text_col, id_col, num_perm=num_perm, shingle_n=shingle_n)
    cand = lsh_candidate_pairs(sig, id_col, bands=bands, rows_per_band=rows_per_band)
    pairs = jaccard_pairs(
        df, text_col, id_col, shingle_n=shingle_n, threshold=threshold, candidates=cand
    )
    universe = df.select(F.col(id_col).alias("id")).distinct()
    comp = connected_components(pairs.select("a", "b"), universe)
    sizes = comp.groupBy("component").agg(F.count("*").cast("int").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
        "cluster_size",
    )
