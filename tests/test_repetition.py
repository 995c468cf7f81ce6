"""Gopher repetition/quality + C4 rules + paragraph dedup.

The oracle queries run these on the single-line word-soup corpus; the
fixtures here carry the multi-line coverage (duplicate lines, bullets,
ellipses, C4 line gates, cross-doc paragraph dedup) with hand-computed
expected values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators import repetition as R


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0].v


# ── repetition signals ───────────────────────────────────────────────

def test_dup_line_stats(spark):
    # 4 lines: "a b" ×2, "c d" ×1, "e" ×1 → 1 dup occurrence of 3 chars
    text = "a b\nc d\na b\ne"
    v = _one(spark, text, R.dup_line_stats("text"))
    assert v.n_lines == 4
    assert v.dup_line_frac == pytest.approx(1 / 4)
    # line chars: 3+3+3+1 = 10; dup occurrence chars = 3
    assert v.dup_line_char_frac == pytest.approx(3 / 10)


def test_dup_line_stats_blank_and_empty(spark):
    assert _one(spark, "", R.dup_line_stats("text")).n_lines == 0
    v = _one(spark, "x\n\n   \nx", R.dup_line_stats("text"))
    assert v.n_lines == 2 and v.dup_line_frac == pytest.approx(0.5)


def test_top_ngram_char_fraction(spark):
    # words: the cat the cat sat → 2-grams: "the cat"×2, "cat the", "cat sat"
    # top run 2, gram word-chars 6; total word chars 3+3+3+3+3=15
    text = "the cat the cat sat"
    assert _one(spark, text, R.top_ngram_char_fraction("text", 2)) == pytest.approx(
        2 * 6 / 15
    )
    # no repeated 3-gram → 0
    assert _one(spark, text, R.top_ngram_char_fraction("text", 3)) == 0.0
    # fewer words than n → 0 (and no descending-sequence fabrication)
    assert _one(spark, "a b", R.top_ngram_char_fraction("text", 5)) == 0.0


def test_top_ngram_tiebreak_prefers_longer(spark):
    # "aa bb" ×2 and "cc dddd" ×2 both run 2; the longer gram (6 chars)
    # must win over the sorted-earlier shorter one (4 chars)
    text = "aa bb x aa bb y cc dddd z cc dddd"
    tot = sum(len(w) for w in text.split())
    assert _one(spark, text, R.top_ngram_char_fraction("text", 2)) == pytest.approx(
        2 * 6 / tot
    )


def test_dup_ngram_char_fraction(spark):
    # 5-gram "a b c d e" occurs twice (disjoint) → one dup occurrence
    text = "a b c d e q a b c d e"
    tot = 11  # eleven 1-char words
    assert _one(spark, text, R.dup_ngram_char_fraction("text", 5)) == pytest.approx(
        5 / tot
    )
    assert _one(spark, "a b c", R.dup_ngram_char_fraction("text", 5)) == 0.0


def test_gopher_repetition_struct_fields(spark):
    v = _one(spark, "x y\nx y", R.gopher_repetition("text"))
    assert set(v.asDict()) == {
        "n_lines", "dup_line_frac", "dup_line_char_frac",
        "top_2gram_char_frac", "top_3gram_char_frac",
        "dup_5gram_char_frac", "dup_10gram_char_frac",
    }
    assert v.dup_line_frac == pytest.approx(0.5)
    assert v.top_2gram_char_frac == pytest.approx(1.0)  # "x y" covers all chars


# ── Gopher quality rules ─────────────────────────────────────────────

GOOD = (
    "the quick brown fox jumps over the lazy dog and that dog would "
    "have been quite happy to be left alone with the fox for a while "
    "since they were friends of a sort and nothing about their meeting "
    "was out of the ordinary on that bright morning in the field"
)


def test_gopher_quality_passes_good_doc(spark):
    v = _one(spark, GOOD, R.gopher_quality_flags("text"))
    assert v.passes and all(v.asDict().values())


def test_gopher_quality_word_count_gate(spark):
    v = _one(spark, "too short to pass.", R.gopher_quality_flags("text"))
    assert not v.ok_word_count and not v.passes


def test_gopher_quality_bullet_and_ellipsis(spark):
    bullets = "\n".join(f"- item {i} of the list" for i in range(10))
    v = _one(spark, bullets, R.gopher_quality_flags("text"))
    assert not v.ok_bullet_lines
    ells = "\n".join("trailing off here..." for _ in range(10))
    v = _one(spark, ells, R.gopher_quality_flags("text"))
    assert not v.ok_ellipsis_lines


def test_gopher_quality_symbol_and_alpha(spark):
    hashes = GOOD + " " + "# " * 40
    v = _one(spark, hashes, R.gopher_quality_flags("text"))
    assert not v.ok_symbol_ratio
    nums = " ".join(str(i) for i in range(100))
    v = _one(spark, nums, R.gopher_quality_flags("text"))
    assert not v.ok_alpha_words and not v.ok_stop_words


def test_gopher_quality_stop_words_distinct(spark):
    # 'the' repeated 60× = only ONE distinct stop word → fails min 2
    v = _one(spark, "the " * 60, R.gopher_quality_flags("text"))
    assert not v.ok_stop_words


# ── C4 rules ─────────────────────────────────────────────────────────

def test_c4_line_keep(spark):
    df = spark.createDataFrame(
        [
            ("this line is fine.",),
            ("no terminal punctuation",),
            ("two words.",),
            ("enable javascript to continue.",),
            ("ends with a question mark?",),
        ],
        "line string",
    )
    kept = [r.k for r in df.select(R.c4_line_keep(F.col("line")).alias("k")).collect()]
    assert kept == [True, False, False, False, True]


def test_c4_clean_and_doc_flags(spark):
    text = (
        "a good first sentence stays here.\n"
        "menu\n"
        "another proper sentence is kept too!\n"
        "click to enable javascript now.\n"
    )
    cleaned = _one(spark, text, R.c4_clean_text("text"))
    assert cleaned == (
        "a good first sentence stays here.\nanother proper sentence is kept too!"
    )
    v = _one(spark, text, R.c4_doc_flags("text"))
    assert v.n_lines == 4 and v.n_kept_lines == 2 and v.n_sentences == 2
    assert not v.keep_doc  # <5 sentences


def test_c4_doc_gates(spark):
    good = "\n".join(f"sentence number {i} is perfectly fine." for i in range(6))
    v = _one(spark, good, R.c4_doc_flags("text"))
    assert v.keep_doc
    v = _one(spark, good + "\nlorem ipsum dolor sit amet.", R.c4_doc_flags("text"))
    assert v.has_lorem_ipsum and not v.keep_doc
    v = _one(spark, good + "\nvar x = {1};", R.c4_doc_flags("text"))
    assert v.has_brace and not v.keep_doc


# ── paragraph dedup ──────────────────────────────────────────────────

def test_dedup_paragraphs_cross_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha para.\nshared boilerplate."),
            (2, "shared boilerplate.\nbeta para."),
            (3, "  SHARED   boilerplate. \ngamma para."),  # ws+case-normalized dup
            (4, ""),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in R.dedup_paragraphs(docs).collect()}
    assert out[1].n_paras == 2 and out[1].n_kept == 2
    assert out[1].text_dedup == "alpha para.\nshared boilerplate."
    # doc 2: boilerplate already seen at (1,1) → dropped, order preserved
    assert out[2].n_kept == 1 and out[2].text_dedup == "beta para."
    assert out[3].n_kept == 1 and out[3].text_dedup == "gamma para."
    # empty doc rides through
    assert out[4].n_paras == 0 and out[4].n_kept == 0 and out[4].text_dedup == ""


def test_dedup_paragraphs_within_doc(spark):
    docs = spark.createDataFrame(
        [(7, "x one.\nx one.\nx two.")], "doc_id int, text string"
    )
    r = R.dedup_paragraphs(docs).collect()[0]
    assert r.n_paras == 3 and r.n_kept == 2
    assert r.text_dedup == "x one.\nx two."


def test_dedup_paragraphs_no_scan_wide_plan(spark):
    """Plan shape: the explode side projects only (id, text) — column
    pruning must reach the scan even with extra columns present."""
    docs = spark.createDataFrame(
        [(1, "p.", "junk", 3.0)], "doc_id int, text string, extra string, score double"
    )
    plan = R.dedup_paragraphs(docs)._jdf.queryExecution().optimizedPlan().toString()
    # 'extra' may appear only in the leaf relation's schema line; the
    # projection feeding the explode must be down to (doc_id, text)
    head, _, leaf = plan.rpartition("+- ")
    assert "extra" not in head and "extra" in leaf


# ── cross-document duplicate n-gram spans ────────────────────────────

def test_cross_doc_ngram_dup(spark):
    shared = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, shared + " alpha beta"),
            (2, shared + " gamma delta"),
            (3, "totally distinct text with no shared spans at all"),
            (4, "tiny"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in R.cross_doc_ngram_dup(docs, n=5).collect()}
    assert len(out) == 4
    # docs 1/2 share exactly the 5-gram "one two three four five"
    assert out[1].n_grams == 3 and out[1].n_dup_grams == 1
    assert out[2].n_dup_grams == 1
    # shared gram word-chars = 3+3+5+4+4 = 19; doc 1 word chars = 19+5+4
    assert out[1].dup_gram_char_frac == pytest.approx(19 / 28)
    assert out[3].n_dup_grams == 0 and out[3].dup_gram_char_frac == 0.0
    # fewer words than n → zero grams, rides through
    assert out[4].n_grams == 0 and out[4].dup_gram_char_frac == 0.0


def test_cross_doc_ngram_dup_within_doc_repeat_not_dup(spark):
    # a gram repeated WITHIN one doc but in no other doc is not cross-doc dup
    docs = spark.createDataFrame(
        [(1, "a b c d e x a b c d e"), (2, "entirely different words here now")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in R.cross_doc_ngram_dup(docs, n=5).collect()}
    assert out[1].n_dup_grams == 0
