"""Connected components + dedup clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.operators.clusters import connected_components, dedup_clusters


def _cc(spark, edges, vertices=None, **kw):
    e = spark.createDataFrame(edges, "a int, b int")
    v = spark.createDataFrame([(x,) for x in vertices], "id int") if vertices else None
    return {
        r.id: r.component for r in connected_components(e, v, **kw).collect()
    }


def test_cc_two_components_and_singleton(spark):
    # {1,2,3} clique-ish, {5,6}, isolated 9
    comp = _cc(spark, [(2, 1), (2, 3), (5, 6)], vertices=[1, 2, 3, 5, 6, 9])
    assert comp == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}


def test_cc_chain_propagates_past_one_hop(spark):
    # a 6-node path: min label must walk the full diameter
    comp = _cc(spark, [(i, i + 1) for i in range(1, 6)])
    assert set(comp.values()) == {1} and len(comp) == 6


def test_cc_orientation_and_dup_edges(spark):
    comp = _cc(spark, [(3, 1), (1, 3), (3, 1), (4, 3)])
    assert comp == {1: 1, 3: 1, 4: 1}


def test_dedup_clusters_planted(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),            # near-dup of 1
            (3, base.replace("dog", "cat")),  # near-dup of 1
            (4, "completely different words about spark shuffles and joins here"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in dedup_clusters(docs, threshold=0.5).collect()}
    assert out[1].cluster_id == 1 and out[1].is_canonical
    assert out[2].cluster_id == 1 and not out[2].is_canonical
    assert out[3].cluster_id == 1 and not out[3].is_canonical
    assert out[4].cluster_id == 4 and out[4].is_canonical and out[4].cluster_size == 1
    assert out[1].cluster_size == 3


def test_dedup_clusters_covers_every_doc(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup_clusters(docs, threshold=0.12)
    assert out.count() == docs.count()
    # every cluster_id is a member of its own cluster and canonical
    bad = (
        out.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("lo"), F.sum(F.col("is_canonical").cast("int")).alias("n_canon"))
        .filter((F.col("lo") != F.col("cluster_id")) | (F.col("n_canon") != 1))
        .count()
    )
    assert bad == 0
