"""Distributed link-graph analytics: PageRank, BFS levels, HITS."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.graph import bfs_levels, hits, pagerank


def _pr(spark, edges, vertices=None, **kw):
    e = spark.createDataFrame(edges, "src int, dst int")
    v = spark.createDataFrame([(x,) for x in vertices], "id int") if vertices else None
    return {r.id: r.rank for r in pagerank(e, v, **kw).collect()}


def test_two_cycle_fixed_point(spark):
    # symmetric 2-cycle: uniform 0.5 is the fixed point at any d
    r = _pr(spark, [(1, 2), (2, 1)], n_iter=5)
    assert r[1] == pytest.approx(0.5) and r[2] == pytest.approx(0.5)


def test_dangling_mass_redistributed(spark):
    # A -> B, B dangles.  After ONE iteration from uniform 0.5/0.5:
    # shipped = 0.5 (A only), dangling share = 0.25
    # rank(A) = 0.15/2 + 0.85*(0 + 0.25)   = 0.2875
    # rank(B) = 0.15/2 + 0.85*(0.5 + 0.25) = 0.7125
    r = _pr(spark, [(1, 2)], vertices=[1, 2], n_iter=1)
    assert r[1] == pytest.approx(0.2875)
    assert r[2] == pytest.approx(0.7125)
    assert sum(r.values()) == pytest.approx(1.0)


def test_rank_mass_conserved_and_hub_wins(spark):
    # star: everyone links to 0; 0 links back to 1.  The semantics are a
    # FIXED iteration count, so pin the exact 20-iteration power-iteration
    # values (hand-recurrence; the hub↔spoke oscillation has not fully
    # damped to the stationary point 0.4696/0.4179 yet and that is by
    # design — convergence thresholds would make results nondeterministic).
    edges = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    r = _pr(spark, edges, n_iter=20)
    assert sum(r.values()) == pytest.approx(1.0)
    assert r[0] == pytest.approx(0.456238, abs=1e-6)
    assert r[1] == pytest.approx(0.431262, abs=1e-6)
    assert r[0] > r[1] > r[2] == pytest.approx(r[7]) == pytest.approx(0.01875)


def test_parallel_edges_add_weight(spark):
    # 1 links twice to 2, once to 3 → 2 gets 2/3 of 1's shipped rank
    r = _pr(spark, [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)], n_iter=1)
    assert r[2] > r[3]


def test_bfs_levels_shortest_hop(spark):
    # 1→2→3→4 plus shortcut 1→3: depth(3) must be the SHORTER path
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], "src int, dst int"
    )
    seeds = spark.createDataFrame([(1,)], "id int")
    lv = {r.id: r.depth for r in bfs_levels(e, seeds).collect()}
    assert lv == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_levels_depth_bound_and_cycle(spark):
    # cycle 1→2→1 terminates; max_depth truncates reach
    e = spark.createDataFrame([(1, 2), (2, 1), (2, 3)], "src int, dst int")
    seeds = spark.createDataFrame([(1,)], "id int")
    lv = {r.id: r.depth for r in bfs_levels(e, seeds, max_depth=1).collect()}
    assert lv == {1: 0, 2: 1}


def test_hits_one_round_hand_values(spark):
    # 1→3, 2→3, 3→1 with L1 normalization, one round:
    # auth ∝ (1/3, 0, 2/3); hub ∝ (2/3, 2/3, 1/3) → (0.4, 0.4, 0.2)
    e = spark.createDataFrame([(1, 3), (2, 3), (3, 1)], "src int, dst int")
    r = {x.id: (x.hub, x.auth) for x in hits(e, n_iter=1).collect()}
    assert r[1][1] == pytest.approx(1 / 3)
    assert r[2][1] == pytest.approx(0.0)
    assert r[3][1] == pytest.approx(2 / 3)
    assert r[1][0] == pytest.approx(0.4)
    assert r[2][0] == pytest.approx(0.4)
    assert r[3][0] == pytest.approx(0.2)
    assert sum(v[0] for v in r.values()) == pytest.approx(1.0)
    assert sum(v[1] for v in r.values()) == pytest.approx(1.0)


def test_anchor_text_rollup(spark):
    from crawl4ai_spark.operators.graph import anchor_text_rollup

    edges = spark.createDataFrame(
        [
            # target 10: 3 in-links from 2 sources; "spark" appears twice
            (1, 10, "Apache Spark docs"),
            (2, 10, "spark homepage"),
            (1, 10, "the engine"),
            # target 20: one in-link
            (3, 20, "duckdb"),
        ],
        ["src", "dst", "anchor"],
    )
    out = anchor_text_rollup(edges, top_k=2)
    rows = {(r["dst"], r["rank"]): r for r in out.collect()}
    r1 = rows[(10, 1)]
    assert r1["term"] == "spark" and r1["term_count"] == 2
    assert r1["n_inlinks"] == 3 and r1["n_sources"] == 2
    # rank 2 breaks the 1-count tie lexicographically
    assert rows[(10, 2)]["term"] == "apache"
    assert (10, 3) not in rows  # top_k cut
    assert rows[(20, 1)]["term"] == "duckdb" and rows[(20, 1)]["n_inlinks"] == 1
