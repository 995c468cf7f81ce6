"""PDF page extraction — the reference's PDF processor re-expressed
without binary dependencies.

Reference behavior spec: /root/reference/crawl4ai/processors/pdf/
processor.py:75-230 (`NaivePDFProcessorStrategy.process`: PyPDF2
PdfReader → per-page `extract_text` → `clean_pdf_text` markdown →
metadata from the reader) and processors/pdf/utils.py:213-350
(`clean_pdf_text`: the headline / numbered-header / author /
affiliation / email / section / quote / hyphenation rules and the
citation + spacing post-passes).  PyPDF2 is absent in this
environment, so the byte-level reader here is a STDLIB SUBSET parser
(regex object scan + zlib FlateDecode + a BT/ET text-operator
scanner) — the same honesty tradeoff as the stdlib-DOM HTML path:
full fidelity for the documented subset (uncompressed object layout,
FlateDecode streams, Tj/TJ/'/" text shows, Td/TD/T*/Tm line moves,
literal + hex strings), document-order page fallback when the page
tree is absent, and a writer (`build_simple_pdf`) that emits valid
PDFs inside that subset for fixtures and round-trip oracles.

Spark surface: `pdf_extract_pages` / `pdf_metadata` follow the
multimodal-plumbing pattern (operators/multimodal.py) — narrow
(id, blob) projection → mapInPandas, one output row per page, zero
shuffle; page blobs parse independently so a 100 TB PDF corpus is
embarrassingly parallel at file granularity.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "build_simple_pdf",
    "parse_pdf",
    "pdf_page_markdown",
    "pdf_extract_pages",
    "pdf_metadata",
]


# ── writer (fixtures / round-trip oracle) ────────────────────────────

def _esc(line: str) -> bytes:
    b = line.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def build_simple_pdf(
    pages: list[str],
    title: str | None = None,
    author: str | None = None,
    producer: str = "crawl4ai_spark",
    compress: bool = True,
) -> bytes:
    """A valid minimal PDF: catalog → page tree → one content stream
    per page (FlateDecode when `compress`), text as one Tj per line
    with Td line moves, full xref + trailer (+ /Info when any
    metadata field is set)."""
    objs: list[bytes] = []

    def _content(text: str) -> bytes:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(text.split("\n")):
            if i:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + _esc(line) + b") Tj")
        ops.append(b"ET")
        return b" ".join(ops)

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages-tree, 3 font,
    # 4..3+n page objects, 4+n..3+2n content streams, last = info
    first_page = 4
    first_stream = first_page + n_pages
    info_num = first_stream + n_pages if (title or author or producer) else None

    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = b" ".join(b"%d 0 R" % (first_page + i) for i in range(n_pages))
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i in range(n_pages):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (first_stream + i)
        )
    streams = []
    for p in pages:
        data = _content(p)
        if compress:
            data = zlib.compress(data)
            streams.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data)
                + data + b"\nendstream"
            )
        else:
            streams.append(
                b"<< /Length %d >>\nstream\n" % len(data) + data + b"\nendstream"
            )
    objs.extend(streams)
    if info_num is not None:
        fields = []
        if title is not None:
            fields.append(b"/Title (" + _esc(title) + b")")
        if author is not None:
            fields.append(b"/Author (" + _esc(author) + b")")
        fields.append(b"/Producer (" + _esc(producer) + b")")
        objs.append(b"<< " + b" ".join(fields) + b" >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    trailer = b"<< /Size %d /Root 1 0 R" % (len(objs) + 1)
    if info_num is not None:
        trailer += b" /Info %d 0 R" % info_num
    trailer += b" >>"
    out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


# ── stdlib subset reader ─────────────────────────────────────────────

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
# direct lengths only: `/Length 7 0 R` is an indirect REFERENCE whose
# first integer is an object number, not a byte count — treating it as
# one would mis-slice the stream; the lookahead rejects the `N R` form
# so those streams fall back to the endstream scan
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)\b")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)


def _scan_objects(blob: bytes) -> dict[int, bytes]:
    """num → object body.  Length-aware: when a body contains a
    stream, the scan jumps /Length bytes past the stream start before
    looking for `endobj`, so compressed bytes that happen to contain
    b"endobj" can't truncate the object (the pure-regex hazard)."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_HEAD_RE.search(blob, pos)
        if not m:
            break
        start = m.end()
        sm = re.compile(rb"stream\r?\n").search(blob, start)
        em = blob.find(b"endobj", start)
        if sm is not None and (em < 0 or sm.start() < em):
            lm = _LENGTH_RE.search(blob, start, sm.start())
            data_start = sm.end()
            if lm:
                em = blob.find(b"endobj", data_start + int(lm.group(1)))
            else:
                es = blob.find(b"endstream", data_start)
                em = blob.find(b"endobj", es if es >= 0 else data_start)
        if em < 0:
            break
        objs[int(m.group(1))] = blob[start:em]
        pos = em + 6
    return objs
_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_INFO_RE = re.compile(rb"/Info\s+(\d+)\s+\d+\s+R")


def _decode_pdf_string(raw: bytes) -> str:
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _read_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a (...) literal starting at the '(' — returns (unescaped
    bytes, index after the closing paren).  Handles \\-escapes, octal
    escapes, and balanced nested parens."""
    assert data[i: i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i: i + 1]
        if c == b"\\":
            nxt = data[i + 1: i + 2]
            esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                   b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}
            if nxt in esc:
                out += esc[nxt]
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and data[j: j + 1].isdigit():
                    j += 1
                out.append(int(data[i + 1: j], 8) & 0xFF)
                i = j
            else:
                i += 1  # line continuation / unknown escape: drop
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _extract_text_ops(content: bytes) -> str:
    """Walk the content stream's text operators.  Shows (Tj, TJ, ',
    \") append to the current line; line moves (Td, TD, T*, Tm, ', \")
    start a new line once any text exists."""
    parts: list[str] = []
    pending_strings: list[bytes] = []
    i, n = 0, len(content)
    first_move = True  # the first Td/TD/Tm after BT positions the
    #                    cursor; only subsequent moves are line breaks

    def newline() -> None:
        nonlocal first_move
        if first_move:
            first_move = False
        else:
            parts.append("\n")

    def show() -> None:
        for s in pending_strings:
            parts.append(_decode_pdf_string(s))
        pending_strings.clear()

    while i < n:
        c = content[i: i + 1]
        if c == b"(":
            s, i = _read_literal(content, i)
            pending_strings.append(s)
        elif c == b"<" and content[i + 1: i + 2] != b"<":
            j = content.find(b">", i)
            if j < 0:
                break
            hx = re.sub(rb"\s", b"", content[i + 1: j])
            if len(hx) % 2:
                hx += b"0"
            pending_strings.append(bytes.fromhex(hx.decode("ascii")))
            i = j + 1
        elif c.isalpha() or c in (b"'", b'"', b"*"):
            m = re.match(rb"[A-Za-z'\"*]+", content[i:])
            op = m.group(0)
            i += len(op)
            if op == b"Tj":
                show()
            elif op == b"TJ":
                show()
            elif op in (b"Td", b"TD", b"T*", b"Tm"):
                pending_strings.clear()  # operands were numbers, not text
                newline()
            elif op == b"'":
                newline()
                show()
            elif op == b'"':
                newline()
                show()
            elif op == b"BT":
                first_move = True
            elif op == b"ET":
                pending_strings.clear()
        else:
            i += 1
    return "".join(parts)


def parse_pdf(blob: bytes) -> tuple[dict, list[str]]:
    """(metadata, page_texts) from PDF bytes — the subset reader.

    Pages resolve through the /Kids order of the page tree (document
    object order as fallback); each page's /Contents stream is
    FlateDecode'd when marked and walked for text ops.  Metadata from
    the trailer's /Info dictionary; n_pages prefers the tree /Count.
    """
    objs = _scan_objects(blob)

    def _stream_of(body: bytes) -> bytes | None:
        sm = re.compile(rb"stream\r?\n").search(body)
        if not sm:
            return None
        head = body[: sm.start()]
        lm = _LENGTH_RE.search(head)
        if lm:
            # exact /Length slice: immune to stream bytes that happen
            # to contain b"endstream"
            data = body[sm.end(): sm.end() + int(lm.group(1))]
        else:
            m = _STREAM_RE.search(body)
            if not m:
                return None
            data = m.group(1)
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                return None
        return data

    page_nums = [
        num for num, body in sorted(objs.items())
        if b"/Type /Page" in body or b"/Type/Page" in re.sub(rb"\s+", b"", body[:200])
    ]
    page_nums = [n for n in page_nums if b"/Kids" not in objs[n]]
    pages_tree = next(
        (body for body in objs.values() if b"/Kids" in body and b"/Count" in body),
        None,
    )
    if pages_tree is not None:
        mk = _KIDS_RE.search(pages_tree)
        if mk:
            order = [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", mk.group(1))]
            known = [n for n in order if n in objs]
            if known:
                page_nums = known

    texts: list[str] = []
    for pn in page_nums:
        mref = _REF_RE.search(objs[pn])
        content = b""
        if mref and int(mref.group(1)) in objs:
            content = _stream_of(objs[int(mref.group(1))]) or b""
        elif _STREAM_RE.search(objs[pn]):
            content = _stream_of(objs[pn]) or b""
        texts.append(_extract_text_ops(content))

    meta: dict = {"title": None, "author": None, "producer": None,
                  "n_pages": len(texts)}
    mc = re.search(rb"/Count\s+(\d+)", pages_tree or b"")
    if mc:
        meta["n_pages"] = int(mc.group(1))
    mi = _INFO_RE.search(blob)
    if mi and int(mi.group(1)) in objs:
        info = objs[int(mi.group(1))]
        for key in ("Title", "Author", "Producer"):
            km = re.search(rb"/" + key.encode() + rb"\s*\(", info)
            if km:
                s, _ = _read_literal(info, km.end() - 1)
                meta[key.lower()] = _decode_pdf_string(s)
    return meta, texts


# ── markdown cleaner (clean_pdf_text re-expression) ──────────────────

_AUTHOR_RE = re.compile(
    r"^\s*[A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+)*\s*(?:[†*0-9]+)?"
    r"(?:,\s*[A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+)*\s*(?:[†*0-9]+)?)*"
    r"(?:,\s*(?:and|&)\s+[A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+)*\s*(?:[†*0-9]+)?)?\s*$"
)
_NUMBERED_RE = re.compile(r"^(\d+(?:\.\d+)*)\s+(.+)$")
_SECTION_RE = re.compile(r"^(Abstract|\d+\s+[A-Z]|References|Appendix|Figure|Table)")


def pdf_page_markdown(page_number: int, text: str) -> str:
    """Markdown for one page's raw text — the reference's rule set
    (processors/pdf/utils.py:213-350) in order: first-line headline,
    empty-line paragraph flush, numbered headers after a blank line,
    page-1 author lines, †-affiliations, {}-emails, section markers,
    quote lines, hyphenation joins; then the citation and spacing
    post-passes."""
    lines = re.sub(r"\.\n", ".\n\n", text).split("\n")
    out: list[str] = []
    para: list[str] = []
    in_header = False
    title_done = False

    def flush() -> None:
        if para:
            p = re.sub(r"\s+", " ", " ".join(para)).strip()
            if p:
                out.append(p)
            para.clear()

    for i, line in enumerate(lines):
        line = line.strip()
        if not line:
            flush()
            continue
        if not title_done and i == 0 and 3 <= len(line.split()) <= 8 and len(lines) > 1:
            flush()
            out.append(f"## {line}")
            title_done = True
            continue
        m = _NUMBERED_RE.match(line)
        if m and i > 0 and not lines[i - 1].strip():
            flush()
            level = m.group(1).count(".") + 1
            out.append(f'{"#" * min(level + 1, 6)} {m.group(2)}')
            in_header = True
            continue
        if page_number == 1 and _AUTHOR_RE.match(line):
            authors = re.sub(r"[†]", "", line)
            names = [a.strip() for a in re.split(r", | and ", authors) if a.strip()]
            fmt = [f"**{' '.join(a.split())}**" for a in names]
            out.append(
                ", ".join(fmt[:-1]) + " and " + fmt[-1] if len(fmt) > 1 else fmt[0]
            )
            continue
        if line.startswith("†"):
            out.append(f"*{line}*")
            continue
        if re.match(r"\{.*?\}", line):
            out.append(f"`{line}`")
            continue
        if _SECTION_RE.match(line):
            flush()
            out.append(f"_[{line}]_")
            in_header = True
            continue
        if line.startswith(('"', "“")):
            flush()
            out.append(f"> {line}")
            continue
        if line.endswith("-"):
            para.append(line[:-1].strip())
        else:
            para.append(line)
        if in_header and not line.endswith((".", "!", "?")):
            flush()
            in_header = False
    flush()

    md = "\n\n".join(out)
    md = re.sub(r"\(([A-Z][a-z]+ et al\. \d{4})\)", r"[\1]", md)
    md = re.sub(r"\s+-\s+", "", md)
    md = re.sub(r"\s+([.,!?)])", r"\1", md)
    return md


# ── Spark surface ────────────────────────────────────────────────────

def pdf_extract_pages(
    df: DataFrame, blob_col: str = "pdf", id_col: str = "doc_id"
) -> DataFrame:
    """(id, page_number, raw_text, markdown, n_chars) — one row per
    page, mapInPandas over the narrow (id, blob) projection."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col, "page_number", "raw_text", "markdown", "n_chars"]
        for pdf_b in batches:
            rows = []
            for did, blob in zip(pdf_b[id_col], pdf_b[blob_col]):
                _, texts = parse_pdf(bytes(blob))
                for pn, t in enumerate(texts, start=1):
                    rows.append({
                        id_col: did, "page_number": pn, "raw_text": t,
                        "markdown": pdf_page_markdown(pn, t),
                        "n_chars": len(t),
                    })
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, blob_col).mapInPandas(
        gen,
        f"{id_col} {id_type}, page_number int, raw_text string, "
        "markdown string, n_chars long",
    )


def pdf_metadata(
    df: DataFrame, blob_col: str = "pdf", id_col: str = "doc_id"
) -> DataFrame:
    """(id, title, author, producer, n_pages) per document."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col, "title", "author", "producer", "n_pages"]
        for pdf_b in batches:
            rows = []
            for did, blob in zip(pdf_b[id_col], pdf_b[blob_col]):
                meta, _ = parse_pdf(bytes(blob))
                rows.append({
                    id_col: did, "title": meta["title"], "author": meta["author"],
                    "producer": meta["producer"], "n_pages": meta["n_pages"],
                })
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, blob_col).mapInPandas(
        gen,
        f"{id_col} {id_type}, title string, author string, "
        "producer string, n_pages int",
    )
