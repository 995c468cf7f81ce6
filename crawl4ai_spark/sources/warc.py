"""WARC archive source — parse Common Crawl-style WARC files into
page rows.

The reference seeds from the Common Crawl *index*
(async_url_seeder.py `_from_cc` :709-762 — see sources/cc_index.py);
the archives the index points INTO are WARC files (ISO 28500, the
public web-archive format: CC publishes ~100 TB/crawl of
`*.warc.gz`).  A Spark pipeline that starts from CC therefore needs a
WARC record parser as its leaf source; this module provides it
Spark-shaped:

    spark.read.format("binaryFile").load("*.warc.gz")   # (path, content)
        → parse_warc(df)                                 # records table
        → filter(warc_type = 'response')
        → the normal extract pipeline (html → spans/markdown)

Format notes (public spec):
  * A WARC file is a sequence of records: a `WARC/1.0` version line,
    `Name: value` headers, CRLF CRLF, `Content-Length` bytes of
    block, CRLF CRLF.
  * Common Crawl gzips each record as its OWN gzip member and
    concatenates the members, so a whole-file gzip decompress of the
    concatenation yields the plain record stream (Python's gzip
    handles multi-member streams natively) while range-reads of one
    record stay possible server-side.
  * A `response` record's block is an HTTP/1.1 response: status
    line + headers + CRLF CRLF + body.  `warcinfo`/`request`/
    `metadata` records ride along and are surfaced with a null
    http_status.

Scale shape: parsing is per-file data-parallel — `binaryFile` gives
one row per archive file and `mapInPandas` parses each partition's
files without any shuffle; the output is immediately filterable /
repartitionable.  One CC segment file is ~1 GB (gz), well inside an
executor's working memory as one row; a 100 TB crawl is ~10^5 files
→ plenty of splits, no straggler file.  Python-side parsing is the
honest cost: WARC framing is byte-oriented with per-record gzip
members — there is no Catalyst expression for it; the parser scans
each buffer once (memoryview, no per-record copies of the tail).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "WARC_SCHEMA",
    "build_warc_record",
    "build_warc_file",
    "parse_warc_bytes",
    "parse_warc",
    "parse_warc_ranges",
    "to_warc_members",
]

_CRLF = b"\r\n"

WARC_SCHEMA = StructType([
    StructField("source", StringType()),       # file path / blob id
    StructField("record_id", StringType()),    # WARC-Record-ID
    StructField("warc_type", StringType()),    # response|request|warcinfo|metadata|...
    StructField("url", StringType()),          # WARC-Target-URI (null for warcinfo)
    StructField("warc_date", StringType()),    # ISO8601 as recorded
    StructField("content_type", StringType()), # record-level Content-Type
    StructField("http_status", IntegerType()), # from the HTTP block (response only)
    StructField("http_content_type", StringType()),
    StructField("payload", BinaryType()),      # HTTP body (response) / raw block
    StructField("payload_length", LongType()),
])


# ── writer side (fixtures, KB export, round-trip tests) ──────────────

def build_warc_record(
    url: str | None,
    payload: bytes,
    warc_type: str = "response",
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    warc_date: str = "2024-01-01T00:00:00Z",
    http_status: int = 200,
    http_content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """One WARC/1.0 record as bytes.  For `response` records the block
    wraps `payload` in a minimal HTTP/1.1 response (the layout CC
    archives use); other types carry `payload` as the raw block."""
    if warc_type == "response":
        http = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {http_content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("ascii") + payload
        block = http
        ctype = "application/http; msgtype=response"
    else:
        block = payload
        ctype = "application/warc-fields" if warc_type == "warcinfo" else "text/plain"
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode("ascii"),
        b"WARC-Record-ID: " + record_id.encode("ascii"),
        b"WARC-Date: " + warc_date.encode("ascii"),
        b"Content-Type: " + ctype.encode("ascii"),
        b"Content-Length: " + str(len(block)).encode("ascii"),
    ]
    if url is not None:
        head.insert(2, b"WARC-Target-URI: " + url.encode("utf-8"))
    return _CRLF.join(head) + _CRLF + _CRLF + block + _CRLF + _CRLF


def build_warc_file(records: Iterable[bytes], member_gzip: bool = True) -> bytes:
    """Concatenate records into one archive blob; `member_gzip=True`
    reproduces CC's one-gzip-member-per-record layout."""
    if not member_gzip:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        out.write(gzip.compress(rec))
    return out.getvalue()


# ── parser ───────────────────────────────────────────────────────────

def _maybe_gunzip(blob: bytes) -> bytes:
    """Transparent multi-member gunzip (CC layout) — passthrough for
    plain WARC bytes."""
    if len(blob) >= 2 and blob[0] == 0x1F and blob[1] == 0x8B:
        return gzip.decompress(blob)  # handles concatenated members
    return blob


def _parse_http(block: memoryview) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an HTTP response block; a
    malformed block degrades to (None, None, raw)."""
    raw = bytes(block)
    sep = raw.find(b"\r\n\r\n")
    if sep < 0 or not raw.startswith(b"HTTP/"):
        return None, None, raw
    head, body = raw[:sep], raw[sep + 4:]
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split(b" ", 2)[1])
    except (IndexError, ValueError):
        return None, None, raw
    ctype = None
    for ln in lines[1:]:
        if ln[:13].lower() == b"content-type:":
            ctype = ln[13:].strip().decode("latin-1")
            break
    return status, ctype, body


def parse_warc_bytes(blob: bytes, source: str = "") -> Iterator[dict]:
    """Yield one dict per WARC record (WARC_SCHEMA field names).
    Single forward scan, no copies of the unparsed tail."""
    data = _maybe_gunzip(blob)
    view = memoryview(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        first = True
        for line in bytes(view[pos:hdr_end]).split(b"\r\n"):
            if first:
                first = False
                if not line.startswith(b"WARC/"):
                    return  # not a WARC stream from here on
                continue
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        block = view[hdr_end + 4: hdr_end + 4 + length]
        wtype = headers.get("warc-type", "")
        status = ctype_http = None
        if wtype == "response":
            status, ctype_http, body = _parse_http(block)
        else:
            body = bytes(block)
        yield {
            "source": source,
            "record_id": headers.get("warc-record-id"),
            "warc_type": wtype,
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": status,
            "http_content_type": ctype_http,
            "payload": body,
            "payload_length": len(body),
        }
        pos = hdr_end + 4 + length


def parse_warc(
    df: DataFrame, blob_col: str = "content", source_col: str = "path"
) -> DataFrame:
    """Records table from an archive-blob DataFrame (the shape
    `spark.read.format("binaryFile")` produces: one row per file).

    mapInPandas: per-file parsing, zero shuffle — partition count =
    input file splits, so downstream repartitions decide layout."""
    cols = [f.name for f in WARC_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for src, blob in zip(pdf[source_col], pdf[blob_col]):
                rows.extend(parse_warc_bytes(bytes(blob), source=str(src)))
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows else pd.DataFrame(columns=cols)
            )

    return df.select(source_col, blob_col).mapInPandas(gen, WARC_SCHEMA)


def parse_warc_ranges(
    df: DataFrame,
    blob_col: str = "content",
    source_col: str = "path",
    offset_col: str = "offset",
    length_col: str = "length",
) -> DataFrame:
    """Targeted record extraction by (offset, length) — the CC *index*
    path: `cc_index_seed` rows carry the archive filename + byte range
    of each page's OWN gzip member, so a pipeline that wants only
    indexed pages never parses whole segments.

    Input rows: (source, blob, offset, length) where blob is the
    archive's bytes (in production the transport's range-GET already
    returns just the member; passing the whole file here works too —
    only the slice is touched).  Output: WARC_SCHEMA rows, one per
    range.  Per-row work, zero shuffle, like `parse_warc`."""
    cols = [f.name for f in WARC_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for src, blob, off, ln in zip(
                pdf[source_col], pdf[blob_col], pdf[offset_col], pdf[length_col]
            ):
                member = bytes(blob)[int(off): int(off) + int(ln)]
                rows.extend(parse_warc_bytes(member, source=str(src)))
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows else pd.DataFrame(columns=cols)
            )

    return df.select(source_col, blob_col, offset_col, length_col).mapInPandas(
        gen, WARC_SCHEMA
    )


def to_warc_members(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    id_col: str | None = None,
    member_gzip: bool = True,
) -> DataFrame:
    """Sink side: one CC-layout gzip member per row → (path, content,
    length).  The caller lays members into archive files however its
    store wants (concat per partition = a real `.warc.gz` file, since
    members are independently decompressible); `parse_warc` /
    `parse_warc_ranges` read the result back.  Pure map work, zero
    shuffle — partitioning (and so file layout) is whatever the input
    carries."""
    cols = [url_col, payload_col] + ([id_col] if id_col else [])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                url = str(pdf[url_col].iloc[i])
                payload = pdf[payload_col].iloc[i]
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                rid = (
                    f"<urn:doc:{pdf[id_col].iloc[i]}>" if id_col
                    else f"<urn:rec:{i}>"
                )
                rec = build_warc_record(url, bytes(payload), record_id=rid)
                blob = build_warc_file([rec], member_gzip=member_gzip)
                rows.append({
                    "path": str(pdf[id_col].iloc[i]) if id_col else url,
                    "content": blob,
                    "length": len(blob),
                })
            yield (
                pd.DataFrame(rows, columns=["path", "content", "length"])
                if rows else pd.DataFrame(columns=["path", "content", "length"])
            )

    return df.select(*cols).mapInPandas(gen, "path string, content binary, length long")
