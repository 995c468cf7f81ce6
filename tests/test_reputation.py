"""Source/host reputation rollup (RefinedWeb-style curation signal).

Checks the hand-computable pieces on a tiny synthetic corpus: dup_rate,
lang_purity, the composite weighting, and that the filter's gate is a
broadcast join (map-side, no fact-table shuffle).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.reputation import (
    filter_by_source_reputation,
    source_reputation,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # source a: 4 docs, one exact dup pair, all "en"
        ("d1", "a", "en", "the cat sat on the mat and it was good for all of them"),
        ("d2", "a", "en", "the cat sat on the mat and it was good for all of them"),
        ("d3", "a", "en", "a completely different document with the usual words in it"),
        ("d4", "a", "en", "yet another unique text that is about the weather today"),
        # source b: 3 docs, no dups, 2 en / 1 de
        ("d5", "b", "en", "some text for the second source with the and of words"),
        ("d6", "b", "en", "more text for the second source with it and that inside"),
        ("d7", "b", "de", "ein text auf deutsch ohne die englischen woerter darin"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "source", "lang", "text"])


def test_dup_rate_and_purity(docs):
    rep = {r["source"]: r for r in source_reputation(docs).collect()}
    a, b = rep["a"], rep["b"]
    assert a["n_docs"] == 4
    assert a["dup_rate"] == pytest.approx(1.0 - 3.0 / 4.0)
    assert a["lang_purity"] == pytest.approx(1.0)
    assert b["dup_rate"] == pytest.approx(0.0)
    assert b["lang_purity"] == pytest.approx(2.0 / 3.0)
    # composite = 0.4*q + 0.3*(1-dup) + 0.3*purity
    assert a["reputation"] == pytest.approx(
        0.4 * a["mean_quality"] + 0.3 * 0.75 + 0.3 * 1.0
    )


def test_filter_gate_is_broadcast(docs):
    kept = filter_by_source_reputation(docs, min_reputation=0.0)
    assert kept.count() == 7  # threshold 0 keeps everything
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    # a real threshold drops whole sources at once
    reps = source_reputation(docs).select("source", "reputation").collect()
    lo, hi = sorted(r["reputation"] for r in reps)
    mid = (lo + hi) / 2.0
    kept_sources = {
        r["source"]
        for r in filter_by_source_reputation(docs, min_reputation=mid)
        .select("source")
        .distinct()
        .collect()
    }
    assert len(kept_sources) == 1


def test_custom_weights(docs):
    rep = source_reputation(docs, weights=(0.0, 1.0, 0.0))
    row = {r["source"]: r for r in rep.collect()}
    assert row["a"]["reputation"] == pytest.approx(1.0 - row["a"]["dup_rate"])
