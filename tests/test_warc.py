"""WARC source (sources/warc): record framing, CC member-gzip layout,
HTTP unwrapping, binaryFile integration, and the distributed
round-trip."""

from __future__ import annotations

import gzip

import pyspark.sql.functions as F

from crawl4ai_spark.sources.warc import (
    build_warc_file,
    build_warc_record,
    parse_warc,
    parse_warc_bytes,
)


def _records():
    return [
        build_warc_record(None, b"software: test\r\n", warc_type="warcinfo",
                          record_id="<urn:uuid:1>"),
        build_warc_record("http://a.test/x", b"<html>A</html>",
                          record_id="<urn:uuid:2>", http_status=200),
        build_warc_record("http://a.test/y", "café".encode("utf-8"),
                          record_id="<urn:uuid:3>", http_status=404,
                          http_content_type="text/plain"),
        build_warc_record("http://a.test/x", b"GET /x HTTP/1.1\r\n\r\n",
                          warc_type="request", record_id="<urn:uuid:4>"),
    ]


def test_roundtrip_plain_and_member_gzip():
    for member_gzip in (False, True):
        blob = build_warc_file(_records(), member_gzip=member_gzip)
        recs = list(parse_warc_bytes(blob, source="f1"))
        assert [r["warc_type"] for r in recs] == [
            "warcinfo", "response", "response", "request"
        ]
        assert recs[1]["url"] == "http://a.test/x"
        assert recs[1]["http_status"] == 200
        assert recs[1]["payload"] == b"<html>A</html>"
        assert recs[1]["http_content_type"] == "text/html; charset=utf-8"
        assert recs[2]["http_status"] == 404
        assert recs[2]["payload"] == "café".encode("utf-8")
        assert recs[2]["payload_length"] == 5
        assert recs[3]["http_status"] is None  # request block, no response line
        assert all(r["record_id"] == f"<urn:uuid:{i+1}>" for i, r in enumerate(recs))


def test_malformed_http_block_degrades():
    rec = build_warc_record("http://a.test/z", b"x", warc_type="metadata")
    # hand-craft a response record whose block is NOT http
    bad = rec.replace(b"WARC-Type: metadata", b"WARC-Type: response")
    recs = list(parse_warc_bytes(bad))
    assert recs[0]["http_status"] is None
    assert recs[0]["payload"] == b"x"


def test_truncated_stream_stops_cleanly():
    blob = build_warc_file(_records(), member_gzip=False)
    recs = list(parse_warc_bytes(blob[: len(blob) - 40]))
    # the final damaged record is dropped, prior ones parse
    assert 1 <= len(recs) < 4


def test_parse_warc_dataframe(spark):
    blob1 = build_warc_file(_records(), member_gzip=True)
    blob2 = build_warc_file(
        [build_warc_record("http://b.test/1", b"<html>B</html>",
                           record_id="<urn:uuid:9>")],
        member_gzip=False,
    )
    df = spark.createDataFrame(
        [("f1.warc.gz", bytearray(blob1)), ("f2.warc", bytearray(blob2))],
        "path string, content binary",
    )
    out = parse_warc(df)
    rows = {(r["source"], r["record_id"]): r for r in out.collect()}
    assert len(rows) == 5
    assert bytes(rows[("f2.warc", "<urn:uuid:9>")]["payload"]) == b"<html>B</html>"
    n_resp = out.filter(F.col("warc_type") == "response").count()
    assert n_resp == 3


def test_binary_file_reader_integration(spark, tmp_path):
    p = tmp_path / "seg-00000.warc.gz"
    p.write_bytes(build_warc_file(_records(), member_gzip=True))
    df = spark.read.format("binaryFile").load(str(p))
    out = parse_warc(df).filter(F.col("warc_type") == "response")
    got = {r["url"]: bytes(r["payload"]) for r in out.collect()}
    assert got == {
        "http://a.test/x": b"<html>A</html>",
        "http://a.test/y": "café".encode("utf-8"),
    }


def test_parse_warc_ranges(spark):
    """CC-index range path: (path, offset, length) rows extract exactly
    their record from the member-gzip archive."""
    from crawl4ai_spark.sources.warc import parse_warc_ranges

    recs = _records()
    members = [gzip.compress(r) for r in recs]
    blob = b"".join(members)
    offs = [sum(len(m) for m in members[:i]) for i in range(len(members))]
    # index rows for the two response records (as cc_index_seed would emit)
    rows = [
        ("seg.warc.gz", bytearray(blob), offs[1], len(members[1])),
        ("seg.warc.gz", bytearray(blob), offs[2], len(members[2])),
    ]
    df = spark.createDataFrame(
        rows, "path string, content binary, offset long, length long"
    )
    out = parse_warc_ranges(df)
    got = {r["url"]: (r["http_status"], bytes(r["payload"])) for r in out.collect()}
    assert got == {
        "http://a.test/x": (200, b"<html>A</html>"),
        "http://a.test/y": (404, "café".encode("utf-8")),
    }


def test_to_warc_members_roundtrip(spark):
    """Sink → source symmetry: rows → gzip members → parsed records."""
    from crawl4ai_spark.sources.warc import parse_warc, to_warc_members

    docs = spark.createDataFrame(
        [(1, "http://d.test/1", "hello"), (2, "http://d.test/2", "wörld")],
        "doc_id int, url string, payload string",
    )
    members = to_warc_members(docs, id_col="doc_id")
    out = parse_warc(members)
    got = {r["record_id"]: (r["url"], bytes(r["payload"])) for r in out.collect()}
    assert got == {
        "<urn:doc:1>": ("http://d.test/1", b"hello"),
        "<urn:doc:2>": ("http://d.test/2", "wörld".encode("utf-8")),
    }
    # member lengths recorded for index building
    lens = {r["path"]: r["length"] for r in members.collect()}
    assert all(v > 0 for v in lens.values()) and set(lens) == {"1", "2"}


def test_gzip_member_layout_is_range_readable():
    """CC's layout property: each record is its own gzip member, so a
    byte-range of one member decompresses standalone."""
    recs = _records()
    members = [gzip.compress(r) for r in recs]
    blob = b"".join(members)
    # extract the second member by offset (as a CC index range-read would)
    off = len(members[0])
    one = gzip.decompress(blob[off: off + len(members[1])])
    got = list(parse_warc_bytes(one))
    assert len(got) == 1 and got[0]["url"] == "http://a.test/x"
