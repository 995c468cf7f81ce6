"""Deterministic sampling / data-mixing operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.sampling import budget_sample, hash_u01, stratified_sample


def _docs(spark, n=400, parts=1):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de")
        .otherwise("fr").alias("lang"),
        (F.col("id") % 17 + 1).cast("int").alias("n_tokens"),
    )
    return df.repartition(parts)


def test_hash_u01_range_and_determinism(spark):
    df = _docs(spark, 100)
    vals = [r.u for r in df.select(hash_u01("doc_id").alias("u")).collect()]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert len(set(vals)) > 90  # spread, not constant


def test_stratified_sample_rate_and_partition_invariance(spark):
    frac = {"en": 0.5, "de": 0.1, "fr": 0.0}
    a = stratified_sample(_docs(spark, 600, parts=1), "lang", frac, "doc_id")
    b = stratified_sample(_docs(spark, 600, parts=7), "lang", frac, "doc_id")
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in b.collect())
    assert ids_a == ids_b  # partitioning-independent
    by_lang = {r.lang: r.n for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("fr", 0) == 0
    assert 0.35 * 200 < by_lang["en"] < 0.65 * 200  # ~rate, 200 per stratum
    assert by_lang["de"] < 0.25 * 200


def test_budget_sample_exact_fill(spark):
    docs = _docs(spark, 300)
    out = budget_sample(docs, "lang", "n_tokens", {"en": 50.0, "de": 120.0}, "doc_id")
    rows = out.collect()
    assert all(r.lang in ("en", "de") for r in rows)
    for lang, budget in (("en", 50), ("de", 120)):
        grp = sorted((r for r in rows if r.lang == lang), key=lambda r: r.cum_weight)
        # every admitted doc started under budget; the last may overshoot
        assert all(r.cum_weight - r.n_tokens < budget for r in grp)
        # the fill is tight: adding the next doc would have crossed
        assert grp[-1].cum_weight >= budget or len(grp) == 100


def test_budget_sample_deterministic_across_partitioning(spark):
    b = {"en": 200.0, "de": 200.0, "fr": 200.0}
    a1 = budget_sample(_docs(spark, 300, 1), "lang", "n_tokens", b, "doc_id")
    a2 = budget_sample(_docs(spark, 300, 5), "lang", "n_tokens", b, "doc_id")
    assert sorted(r.doc_id for r in a1.collect()) == sorted(r.doc_id for r in a2.collect())


def test_budget_sample_approx_mode(spark):
    docs = _docs(spark, 3000)
    # total per stratum ≈ 1000 docs × mean 9 tokens ≈ 9000; ask for ~a third
    out = budget_sample(docs, "lang", "n_tokens", {"en": 3000.0}, "doc_id", approx=True)
    got = out.agg(F.sum("n_tokens").alias("s")).collect()[0].s
    assert got == pytest.approx(3000, rel=0.25)
    # approx plan is window-free (no per-stratum sort)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_mixture_weights_alpha_extremes(spark):
    from crawl4ai_spark.operators.sampling import mixture_weights

    rows = [(f"d{i}", "big") for i in range(90)] + [(f"s{i}", "small") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    # alpha=1 keeps the natural distribution
    w1 = {r["source"]: r for r in mixture_weights(df, alpha=1.0).collect()}
    assert w1["big"]["target_share"] == pytest.approx(0.9)
    assert w1["small"]["target_share"] == pytest.approx(0.1)

    # alpha=0 is uniform over groups
    w0 = {r["source"]: r for r in mixture_weights(df, alpha=0.0).collect()}
    assert w0["big"]["target_share"] == pytest.approx(0.5)
    assert w0["small"]["target_share"] == pytest.approx(0.5)

    # 0 < alpha < 1 flattens: small group's share strictly between
    wa = {r["source"]: r for r in mixture_weights(df, alpha=0.5).collect()}
    assert 0.1 < wa["small"]["target_share"] < 0.5

    # rate saturates at 1 when a group's quota exceeds its size
    wr = {r["source"]: r for r in mixture_weights(df, alpha=0.0, budget=80.0).collect()}
    assert wr["small"]["rate"] == pytest.approx(1.0)  # quota 40 > 10 docs
    assert wr["big"]["rate"] == pytest.approx(40.0 / 90.0)


def test_mixture_sample_deterministic_and_broadcast(spark):
    from crawl4ai_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i % 4 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = mixture_sample(df, "source", "doc_id", alpha=0.7, budget=100.0)
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in
                  mixture_sample(df.repartition(7), "source", "doc_id",
                                 alpha=0.7, budget=100.0).collect())
    assert ids1 == ids2  # partitioning-invariant
    assert 60 <= len(ids1) <= 140  # ~budget in expectation
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
