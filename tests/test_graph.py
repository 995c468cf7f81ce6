"""Distributed PageRank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.graph import pagerank


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
