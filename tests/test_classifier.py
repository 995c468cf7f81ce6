"""Distributed multinomial Naive Bayes fit/predict."""

from __future__ import annotations

import math

import pytest

from crawl4ai_spark.operators.classifier import nb_fit, nb_predict


def _fit_predict(spark, train, test):
    tr = spark.createDataFrame(train, "doc_id int, text string, label string")
    te = spark.createDataFrame(test, "doc_id int, text string")
    model = nb_fit(tr)
    return {r.doc_id: (r.label, r.score) for r in nb_predict(te, model).collect()}


def test_hand_computed_scores(spark):
    # Train: X = "red red blue", Y = "green green blue".  V = 3.
    # Doc "red blue" (m=2), Laplace a=1:
    #   score(X) = ln(1/2) - 2 ln 6 + (ln 3 + ln 2) = ln(1/12)
    #   score(Y) = ln(1/2) - 2 ln 6 + ln 2        = ln(1/36)
    train = [(0, "red red blue", "X"), (2, "green green blue", "Y")]
    r = _fit_predict(spark, train, [(10, "red blue")])
    assert r[10][0] == "X"
    assert r[10][1] == pytest.approx(math.log(1 / 12))


def test_oov_tokens_ignored_and_no_evidence_omitted(spark):
    train = [(0, "red red blue", "X"), (2, "green green blue", "Y")]
    # "purple" is out-of-vocabulary: contributes nothing, so the score
    # equals the pure "red blue" score; an all-OOV doc has no evidence
    # and is omitted entirely.
    r = _fit_predict(
        spark, train, [(10, "red blue purple"), (11, "purple zzz")]
    )
    assert set(r) == {10}
    assert r[10][1] == pytest.approx(math.log(1 / 12))


def test_priors_matter(spark):
    # Same token profile per class, 3:1 doc prior → prior decides.
    train = [
        (0, "w w", "X"), (2, "w w", "X"), (4, "w w", "X"), (6, "w w", "Y"),
    ]
    r = _fit_predict(spark, train, [(10, "w")])
    assert r[10][0] == "X"


def test_tie_breaks_to_smallest_label(spark):
    # Perfectly symmetric classes → equal scores → lexical tiebreak.
    train = [(0, "a a", "X"), (2, "a a", "Y")]
    r = _fit_predict(spark, train, [(10, "a")])
    assert r[10][0] == "X"
