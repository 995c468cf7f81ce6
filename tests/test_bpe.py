"""Distributed BPE fit/encode pinned against a pure-Python reference
implementation of Sennrich et al.'s algorithm (same tie-breaks)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_fit,
    merge_pair,
    pair_counts,
    symbolize,
    word_freq_table,
)


def _py_words(text: str) -> list[str]:
    return [w for w in re.sub(r"\s+", " ", text.lower().strip()).split(" ") if w]


def _py_bpe_fit(texts: list[str], n_merges: int, min_count: int = 2):
    wf = Counter()
    for t in texts:
        wf.update(_py_words(t))
    vocab = {w: list(w) + [END] for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), c = best
        if c < min_count:
            break
        merges.append((a, b, c))
        for w, syms in vocab.items():
            out = []
            for t in syms:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            vocab[w] = out
    return merges


CORPUS = [
    "low low low low low lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
    "the lowest of the low",
]


def test_fit_matches_python_reference(spark):
    docs = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    got = bpe_fit(docs, 10)
    want = _py_bpe_fit(CORPUS, 10)
    assert got == want
    assert len(got) == 10


def test_fit_early_stop_on_min_count(spark):
    docs = spark.createDataFrame([(1, "ab")], ["doc_id", "text"])
    # every pair occurs once -> below min_count=2 -> no merges
    assert bpe_fit(docs, 5, min_count=2) == []


def test_merge_pair_nonoverlapping(spark):
    df = spark.createDataFrame([(["a", "a", "a", "a"],)], ["syms"])
    out = df.select(merge_pair(F.col("syms"), "a", "a").alias("m")).collect()[0]["m"]
    assert out == ["aa", "aa"]
    df2 = spark.createDataFrame([(["a", "a", "a"],)], ["syms"])
    out2 = df2.select(merge_pair(F.col("syms"), "a", "a").alias("m")).collect()[0]["m"]
    assert out2 == ["aa", "a"]


def test_encode_applies_learned_merges(spark):
    docs = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    merges = bpe_fit(docs, 8)
    enc = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, merges).collect()}

    # python-side encode of doc 0 with the same merges
    def apply(word):
        syms = list(word) + [END]
        for a, b, _ in merges:
            out = []
            for t in syms:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            syms = out
        return syms

    want = [t for w in _py_words(CORPUS[0]) for t in apply(w)]
    assert enc[0] == want
    # encoding is reversible modulo the end marker
    assert "".join(enc[0]).replace(END, " ").strip() == " ".join(_py_words(CORPUS[0]))


def test_single_char_and_empty_words(spark):
    docs = spark.createDataFrame([(1, "a  b   a a")], ["doc_id", "text"])
    wf = {r["word"]: r["n"] for r in word_freq_table(docs).collect()}
    assert wf == {"a": 3, "b": 1}
    syms = docs.sparkSession.createDataFrame([("a",)], ["word"]).select(
        symbolize("word").alias("s")
    ).collect()[0]["s"]
    assert syms == ["a", END]
    pc = {(r["a"], r["b"]): r["count"] for r in pair_counts(
        word_freq_table(docs).withColumn("syms", symbolize("word"))).collect()}
    assert pc[("a", END)] == 3 and pc[("b", END)] == 1
