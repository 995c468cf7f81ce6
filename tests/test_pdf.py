"""PDF subset reader + markdown cleaner (extraction/pdf): round-trip
through the writer, escapes/unicode, page-tree order, metadata,
cleaner rules vs the reference algorithm, Spark surface."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl4ai_spark.extraction.pdf import (
    build_simple_pdf,
    parse_pdf,
    pdf_extract_pages,
    pdf_metadata,
    pdf_page_markdown,
)


def test_roundtrip_multipage_compressed_and_plain():
    pages = ["Hello world\nsecond line", "Page two text"]
    for compress in (True, False):
        blob = build_simple_pdf(pages, title="A Title", author="An Author",
                                compress=compress)
        meta, texts = parse_pdf(blob)
        assert texts == pages
        assert meta["n_pages"] == 2
        assert meta["title"] == "A Title"
        assert meta["author"] == "An Author"
        assert meta["producer"] == "crawl4ai_spark"


def test_escapes_and_unicode_roundtrip():
    tricky = "parens (nested (deep)) \\ backslash\ntabs\tok café ünïcode"
    _, texts = parse_pdf(build_simple_pdf([tricky]))
    assert texts == [tricky]


def test_header_is_valid_pdf_shape():
    blob = build_simple_pdf(["x"])
    assert blob.startswith(b"%PDF-1.4")
    assert blob.rstrip().endswith(b"%%EOF")
    assert b"xref" in blob and b"trailer" in blob


def test_kids_order_overrides_object_order():
    # build a 2-page pdf, then swap the /Kids order to prove the page
    # tree (not object numbering) decides page sequence
    blob = build_simple_pdf(["first", "second"])
    swapped = blob.replace(b"/Kids [4 0 R 5 0 R]", b"/Kids [5 0 R 4 0 R]")
    assert swapped != blob
    _, texts = parse_pdf(swapped)
    assert texts == ["second", "first"]


def test_hex_string_show():
    # hand-built uncompressed content stream with a hex string
    content = b"BT /F1 12 Tf 72 720 Td <48656C6C6F> Tj ET"
    blob = build_simple_pdf(["placeholder"], compress=False).replace(
        b"(placeholder) Tj", b"<48656C6C6F> Tj"
    )
    # /Length is now wrong by the edit; parser slices by length, so
    # rebuild properly instead: craft via parse of the raw ops
    from crawl4ai_spark.extraction.pdf import _extract_text_ops
    assert _extract_text_ops(content) == "Hello"


def test_indirect_length_falls_back_to_endstream_scan():
    """`/Length 7 0 R` is an object REFERENCE, not a byte count — the
    parser must not slice 7 bytes (real-world writers emit this form)."""
    import re

    blob = build_simple_pdf(["indirect length page"], compress=False)
    patched = re.sub(rb"<< /Length \d+ >>", b"<< /Length 99 0 R >>", blob, count=1)
    assert patched != blob
    _, texts = parse_pdf(patched)
    assert texts == ["indirect length page"]


def test_markdown_cleaner_rules():
    """Pins REFERENCE semantics (processors/pdf/utils.py:213-350)
    including its quirks: the author regex requires a comma before
    'and'; a lone capitalized word on page 1 ('Abstract') matches the
    author rule BEFORE the section rule; hyphen-stripped lines rejoin
    with a space ('hyphen ated') because flush ' '.join()s."""
    text = (
        "A Study Of Crawling\n"
        "John Smith, Jane Doe, and Alan Turing\n"
        "†University of Somewhere\n"
        "\n"
        "This paper studies crawling systems .\n"
        "It joins hyphen-\n"
        "ated words across lines (Smith et al. 2020).\n"
    )
    md = pdf_page_markdown(1, text)
    assert md.startswith("## A Study Of Crawling")
    # Oxford comma: the reference splits on ', ' first, so the last
    # element keeps its 'and ' prefix — pinned as-is
    assert "**John Smith**, **Jane Doe** and **and Alan Turing**" in md
    assert "*†University of Somewhere*" in md
    assert "hyphen ated words" in md           # reference join semantics
    assert "[Smith et al. 2020]" in md         # citation rewrite
    assert "systems." in md                    # punctuation spacing fix
    # page 1: bare 'Abstract' hits the author rule first (reference
    # rule order); page > 1 the author rule is off → section marker
    assert "**Abstract**" in pdf_page_markdown(1, "x y\n\nAbstract\nBody.")
    md2 = pdf_page_markdown(2, "x y\n\nAbstract\nBody follows here.")
    assert "_[Abstract]_" in md2
    assert "**" not in pdf_page_markdown(2, "John Smith, Jane Doe, and Alan Turing")


def test_numbered_header_levels():
    md = pdf_page_markdown(2, "intro para\n\n2.1 Background\nBody text here.")
    assert "### Background" in md


def test_spark_surface(spark):
    rows = [
        (1, bytearray(build_simple_pdf(["p one line a\nline b", "p two"],
                                       title="T1", author="A1"))),
        (2, bytearray(build_simple_pdf(["single page"], title="T2"))),
    ]
    df = spark.createDataFrame(rows, "doc_id int, pdf binary")
    pages = pdf_extract_pages(df)
    got = {(r["doc_id"], r["page_number"]): r for r in pages.collect()}
    assert len(got) == 3
    assert got[(1, 1)]["raw_text"] == "p one line a\nline b"
    assert got[(1, 2)]["raw_text"] == "p two"
    assert got[(2, 1)]["n_chars"] == len("single page")
    assert got[(1, 1)]["markdown"]  # cleaner ran

    meta = {r["doc_id"]: r for r in pdf_metadata(df).collect()}
    assert meta[1]["n_pages"] == 2 and meta[1]["title"] == "T1"
    assert meta[2]["author"] is None
    # plan: Python reaches it only as MapInPandas (no row-wise UDF)
    plan = pages._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
