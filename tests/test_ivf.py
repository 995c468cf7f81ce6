"""IVF (inverted-file) approximate top-k over an embedding column.

Reference behavior: crawl4ai has no ANN operator; this is the
training-data-pipeline extension (similarity search: brute-force
baseline + bucketed scale paths).  IVF is the data-ADAPTIVE companion
to the data-oblivious hyperplane LSH (`lsh_topk`): a small coarse
quantizer (here: deterministic per-label mean centroids) partitions
the corpus into cells; queries probe their n_probe nearest cells and
exact-cosine re-rank inside them only.

Recall is asserted on the LSH-honest planted workload (see
test_multiprobe_lsh.py): the synthetic embeddings are label-clustered,
so a query planted at cos ≈ 0.96 of a corpus vector lands in (or one
probe away from) that vector's cell with near-certainty.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.similarity import (
    collect_centroids, cosine_topk, ivf_cells, ivf_topk, kmeans_fit,
)


def _label_centroids(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
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
    return collect_centroids(cent)


def test_ivf_cells_tiny(spark):
    # 2-D, 3 axis-ish centroids: assignment and probe order are exact.
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0])]
    df = spark.createDataFrame(
        [(0, [0.9, 0.1]), (1, [0.1, 0.9]), (2, [-0.5, 0.5]), (3, [0.7, 0.7])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r["cells"]
        for r in df.select(
            "vec_id", ivf_cells(F.col("embedding"), cents, n_probe=2).alias("cells")
        ).collect()
    }
    assert out[0] == [0, 1]  # near +x: cell 0, then +y
    assert out[1] == [1, 0]
    assert out[2] == [1, 2]  # 135°: +y first, then -x
    assert out[3] == [0, 1]  # exact 45° tie between cells 0 and 1 → cid asc


def test_ivf_cells_partition_corpus(spark, sf_dir):
    # n_probe=1 assignment is a partition: every vector in exactly one
    # cell, total count preserved (the no-candidate-dedup invariant).
    cents = _label_centroids(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    assigned = emb.select(
        F.element_at(ivf_cells(F.col("embedding"), cents, 1), 1).alias("cell")
    )
    per_cell = assigned.groupBy("cell").count().collect()
    assert sum(r["count"] for r in per_cell) == n
    assert all(r["cell"] is not None for r in per_cell)


@pytest.fixture(scope="module")
def planted(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = [r.vec_id for r in rows]
    rng = np.random.default_rng(11)
    noise = rng.standard_normal(V.shape)
    noise *= np.linalg.norm(V, axis=1, keepdims=True) / np.linalg.norm(
        noise, axis=1, keepdims=True
    )
    Q = V + 0.28 * noise  # cos(v, v') ≈ 0.963
    corpus = spark.createDataFrame(
        [(i, v.tolist()) for i, v in zip(ids, V)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(i, q.tolist()) for i, q in zip(ids, Q)],
        "query_id long, query_vec array<double>",
    )
    return corpus, queries


def test_ivf_recall_planted(spark, sf_dir, planted):
    corpus, queries = planted
    cents = _label_centroids(spark, sf_dir)
    hits = (
        ivf_topk(corpus, queries, cents, k=5, n_probe=2)
        .filter(F.col("query_id") == F.col("vec_id"))
        .count()
    )
    n = queries.count()
    # planted neighbor sits in its source's label cluster; 2 probes
    # recover cell-boundary plants.
    assert hits / n >= 0.9, f"planted recall {hits}/{n}"


def test_ivf_matches_brute_force_within_probed_cells(spark, sf_dir, planted):
    corpus, queries = planted
    cents = _label_centroids(spark, sf_dir)
    k = 3
    ivf = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in ivf_topk(corpus, queries, cents, k=k, n_probe=len(cents)).collect()
    }
    # probing ALL cells == exact brute force
    brute = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in cosine_topk(corpus, queries, k=k).collect()
    }
    assert ivf == brute


@pytest.fixture(scope="module")
def four_clusters(spark):
    """4 well-separated clusters around near-orthogonal directions in
    8-D (tight noise): cosine within-cluster ≈ 0.99, across ≈ 0."""
    rng = np.random.default_rng(3)
    dirs = np.eye(8)[:4]
    rows = []
    for c in range(4):
        for j in range(25):
            v = dirs[c] + 0.05 * rng.standard_normal(8)
            rows.append((c * 25 + j, v.tolist(), c))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, truth int"
    )


def test_kmeans_recovers_separated_clusters(spark, four_clusters):
    cents = kmeans_fit(four_clusters, k=4, n_iter=4)
    assert len(cents) == 4
    assigned = four_clusters.select(
        "truth", F.element_at(ivf_cells(F.col("embedding"), cents, 1), 1).alias("cell")
    ).collect()
    # exact recovery: each true cluster maps to exactly one cell, 1:1
    mapping = {}
    for r in assigned:
        mapping.setdefault(r["truth"], set()).add(r["cell"])
    cells = [next(iter(s)) for s in mapping.values() if len(s) == 1]
    assert all(len(s) == 1 for s in mapping.values()), mapping
    assert len(set(cells)) == 4


def test_kmeans_quantizer_end_to_end(spark, four_clusters):
    # fitted quantizer drives ivf_topk: with separated clusters and
    # n_probe=1 the approximate result IS the exact brute force.
    cents = kmeans_fit(four_clusters, k=4, n_iter=4)
    queries = four_clusters.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = four_clusters.filter(F.col("vec_id") % 25 != 0)
    ivf = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in ivf_topk(corpus, queries, cents, k=3, n_probe=1).collect()
    }
    brute = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in cosine_topk(corpus, queries, k=3).collect()
    }
    assert ivf == brute


def test_kmeans_deterministic(spark, four_clusters):
    a = kmeans_fit(four_clusters, k=4, n_iter=2)
    b = kmeans_fit(four_clusters, k=4, n_iter=2)
    assert a == b
    c = kmeans_fit(four_clusters, k=4, n_iter=2, seed=7)
    assert [cid for cid, _ in c] == [0, 1, 2, 3]


def test_kmeans_k_exceeds_corpus(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        kmeans_fit(df, k=5)


def test_ivf_index_search_matches_topk(spark, sf_dir, planted, tmp_path):
    """Persisted-index search ≡ in-memory ivf_topk, and the scan reads
    ONLY the probed cells' partitions."""
    from crawl4ai_spark.operators.similarity import ivf_search, ivf_write_index

    corpus, queries = planted
    cents = _label_centroids(spark, sf_dir)
    path = str(tmp_path / "ivf_index")
    ivf_write_index(corpus, cents, path)

    out = ivf_search(spark, path, queries, cents, k=5, n_probe=2)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["cos_sim"], 9))
        for r in out.collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["cos_sim"], 9))
        for r in ivf_topk(corpus, queries, cents, k=5, n_probe=2).collect()
    }
    assert got == want

    # pruning: the probed-cell filter must reach the scan as a
    # partition filter, and the scan must touch no unprobed partition.
    probed = {
        r["cell"]
        for r in queries.select(
            F.explode(ivf_cells(F.col("query_vec"), cents, 2)).alias("cell")
        ).collect()
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    scanned = {
        int(r["cell"])
        for r in spark.read.parquet(path)
        .filter(F.col("cell").isin(sorted(probed)))
        .select("cell").distinct().collect()
    }
    assert scanned <= probed


def test_ivf_index_append_frozen_quantizer(spark, sf_dir, planted, tmp_path):
    """Appending new vectors under the SAME quantizer extends the index
    consistently: a search finds a planted near-dup added by append."""
    from crawl4ai_spark.operators.similarity import ivf_search, ivf_write_index

    corpus, queries = planted
    cents = _label_centroids(spark, sf_dir)
    path = str(tmp_path / "ivf_index")
    ivf_write_index(corpus, cents, path)

    # append one near-copy of vector 0 with a fresh id
    v0 = corpus.filter(F.col("vec_id") == 0).first()["embedding"]
    extra = spark.createDataFrame(
        [(100000, [x * 1.01 for x in v0])], "vec_id long, embedding array<double>"
    )
    (
        extra.withColumn(
            "cell", F.element_at(ivf_cells(F.col("embedding"), cents, 1), 1)
        )
        .write.partitionBy("cell").mode("append").parquet(path)
    )
    q0 = queries.filter(F.col("query_id") == 0)
    top = ivf_search(spark, path, q0, cents, k=5, n_probe=2).orderBy("rank").collect()
    by_id = {r["vec_id"]: r["cos_sim"] for r in top}
    assert 100000 in by_id
    # collinear twin: scaling never changes cosine, so if the source
    # also made top-k their scores agree to float precision
    if 0 in by_id:
        assert abs(by_id[0] - by_id[100000]) < 1e-9


def test_ivf_plan_no_cartesian(spark, sf_dir, planted):
    corpus, queries = planted
    cents = _label_centroids(spark, sf_dir)
    plan = ivf_topk(corpus, queries, cents, k=5, n_probe=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
