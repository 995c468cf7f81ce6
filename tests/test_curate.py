"""Curation-report composition."""

from __future__ import annotations

from crawl4ai_spark.operators.curate import curation_report

BASE = (
    "the quick brown fox jumps over the lazy dog and that dog would "
    "have been quite happy to be left alone with the fox for a while "
    "since they were friends of a sort and nothing was wrong that day "
    "in the wide green field where both of them liked to wander about "
    "looking for something interesting to chase before the sun went down"
)


def test_curation_report_decisions(spark):
    docs = spark.createDataFrame(
        [
            (1, BASE),                     # canonical everywhere → kept
            (2, BASE),                     # exact dup of 1 → dropped
            (3, BASE + " extra tail"),     # near-dup of 1 → dropped
            (4, "short doc."),             # too few tokens → dropped
            (5, "a completely different long document about spark plans and "
                "shuffles and joins and windows and aggregates running at "
                "scale with many distinct words to clear the token floor"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in curation_report(docs, min_tokens=20, threshold=0.5).collect()}
    assert len(out) == 5
    assert out[1].kept and out[1].exact_canonical and out[1].neardup_canonical
    assert not out[2].exact_canonical and not out[2].kept
    assert out[2].cluster_id == 1 and out[2].cluster_size >= 3
    assert out[3].exact_canonical and not out[3].neardup_canonical and not out[3].kept
    assert not out[4].ok_len and not out[4].kept
    assert out[5].kept and out[5].cluster_size == 1
    # quality verdicts are reported, not gating
    assert out[1].gopher_passes and not out[1].c4_keep  # no terminal punctuation lines ≥5
