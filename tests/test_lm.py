"""Unit tests for the n-gram LM operators (operators/lm.py):
bigram-LM perplexity math pinned against a pure-Python reference
implementation, and DSIR weight properties (target-like docs weigh
more than off-target docs)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _py_tokens(text: str) -> list[str]:
    return [w for w in " ".join(text.lower().strip().split()).split(" ") if w]


def _py_bigrams(text: str) -> list[str]:
    ws = _py_tokens(text)
    return [f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]


def _py_fit(ref_texts, k=0.1):
    bigs = [b for t in ref_texts for b in _py_bigrams(t)]
    counts = Counter(bigs)
    ctx = Counter(b.split(" ")[0] for b in bigs)
    vocab = {w for t in ref_texts for w in _py_tokens(t)}
    v = len(vocab)

    def logp(bigram: str) -> float:
        w1 = bigram.split(" ")[0]
        if bigram in counts:
            return math.log((counts[bigram] + k) / (ctx[w1] + k * v))
        if w1 in ctx:
            return math.log(k / (ctx[w1] + k * v))
        return -math.log(v)

    return logp


REF = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
]
SCORE = [
    ("d0", "the cat sat on the log"),   # in-domain
    ("d1", "zebra quantum flux norway"),  # all-OOV
    ("d2", "the cat"),                   # single bigram
    ("d3", "x"),                         # no bigram → absent
]


@pytest.fixture(scope="module")
def fitted(spark):
    from crawl4ai_spark.operators.lm import fit_bigram_lm

    ref = spark.createDataFrame(
        [(f"r{i}", t) for i, t in enumerate(REF)], ["doc_id", "text"]
    )
    return fit_bigram_lm(ref, k=0.1)


def test_perplexity_matches_python_reference(spark, fitted):
    from crawl4ai_spark.operators.lm import score_log_perplexity

    model, ctx, vocab = fitted
    df = spark.createDataFrame(SCORE, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["log_ppl"])
        for r in score_log_perplexity(df, model, ctx, vocab).collect()
    }
    logp = _py_fit(REF, k=0.1)
    for doc_id, text in SCORE:
        bigs = _py_bigrams(text)
        if not bigs:
            assert doc_id not in got
            continue
        want = -sum(logp(b) for b in bigs) / len(bigs)
        n, lp = got[doc_id]
        assert n == len(bigs)
        assert lp == pytest.approx(want, abs=1e-9)
    # fluent text must score lower log-ppl than OOV gibberish
    assert got["d0"][1] < got["d1"][1]


def test_model_dims_are_vocabulary_bounded(fitted):
    model, ctx, vocab = fitted
    v = vocab.collect()[0]
    assert v["v_size"] == len({w for t in REF for w in _py_tokens(t)})
    # every distinct reference bigram has exactly one model row
    assert model.count() == len({b for t in REF for b in _py_bigrams(t)})
    assert ctx.count() == len({b.split(" ")[0] for t in REF for b in _py_bigrams(t)})


def _py_bucket(feat: str, buckets: int) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % buckets


def test_dsir_weights_match_python_reference(spark):
    from crawl4ai_spark.operators.lm import dsir_bucket_weights, dsir_log_weights

    B, k = 64, 1.0
    rows = [
        ("t0", "alpha beta alpha beta gamma", 1),
        ("t1", "alpha beta gamma delta", 1),
        ("r0", "omega psi chi phi", 0),
        ("r1", "alpha beta alpha", 0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_target"])
    target = df.filter("is_target = 1")
    wdim = dsir_bucket_weights(df, target, buckets=B, k=k)
    got = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_log_weights(df, wdim, buckets=B).collect()
    }

    def feats(text):
        return _py_tokens(text) + _py_bigrams(text)

    tc = Counter(_py_bucket(f, B) for _, t, it in rows if it for f in feats(t))
    rc = Counter(_py_bucket(f, B) for _, t, _ in rows for f in feats(t))
    nt, nr = sum(tc.values()), sum(rc.values())

    def ratio(b):
        return math.log((tc[b] + k) / (nt + k * B)) - math.log(
            (rc[b] + k) / (nr + k * B)
        )

    for doc_id, text, _ in rows:
        fs = feats(text)
        want = sum(ratio(_py_bucket(f, B)) for f in fs)
        n, lw = got[doc_id]
        assert n == len(fs)
        assert lw == pytest.approx(want, abs=1e-9)
    # docs made of target-heavy tokens outweigh off-target docs
    assert got["t0"][1] > got["r0"][1]


def test_dsir_dim_covers_every_bucket(spark):
    from crawl4ai_spark.operators.lm import dsir_bucket_weights

    df = spark.createDataFrame([("a", "x y z")], ["doc_id", "text"])
    wdim = dsir_bucket_weights(df, df, buckets=32)
    assert wdim.count() == 32
    # p == q when target == raw → every log-ratio is exactly 0
    assert wdim.filter(F.abs("log_ratio") > 1e-12).count() == 0


def test_ccnet_buckets_terciles(spark):
    from crawl4ai_spark.operators.lm import ccnet_buckets

    # 9 docs per lang with distinct perplexities -> 3/3/3 terciles
    rows = [(f"{lang}{i}", lang, float(i)) for lang in ("en", "de") for i in range(9)]
    scored = spark.createDataFrame(rows, ["doc_id", "lang", "log_ppl"])
    out = ccnet_buckets(scored)
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    for lang in ("en", "de"):
        for i in range(9):
            want = "head" if i <= 2 else ("middle" if i <= 5 else "tail")
            # percentile(1/3) of 0..8 interpolates to 8/3 ~ 2.67: docs 0-2
            assert got[f"{lang}{i}"] == want, (lang, i)
    # cutoffs are per-language: shifting one language's scale moves ITS cuts only
    rows2 = [(f"e{i}", "en", float(i)) for i in range(9)] + [
        (f"d{i}", "de", 100.0 + i) for i in range(9)
    ]
    out2 = {r["doc_id"]: r["bucket"] for r in
            ccnet_buckets(spark.createDataFrame(rows2, ["doc_id", "lang", "log_ppl"])).collect()}
    assert out2["d0"] == "head" and out2["e8"] == "tail"


def test_ccnet_buckets_broadcast_plan(spark):
    from crawl4ai_spark.operators.lm import ccnet_buckets

    scored = spark.createDataFrame(
        [(str(i), "en", float(i)) for i in range(10)], ["doc_id", "lang", "log_ppl"]
    )
    out = ccnet_buckets(scored)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan  # no per-language sort anywhere
