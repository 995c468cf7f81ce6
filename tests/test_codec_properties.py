"""Property-based fuzz of the round-4 byte-level codecs: WARC, PDF,
DER certificates, and the cuckoo-filter numpy kernel.  All pure
Python — no Spark session — so hypothesis runs at full speed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_spark.extraction.pdf import build_simple_pdf, parse_pdf
from crawl4ai_spark.operators.cuckoo import (
    _delete_shard,
    _insert_shard,
    _probe_shard,
)
from crawl4ai_spark.sources.ssl_cert import build_der_cert, parse_der_cert
from crawl4ai_spark.sources.warc import (
    build_warc_file,
    build_warc_record,
    parse_warc_bytes,
)

# ── WARC ─────────────────────────────────────────────────────────────

_payload = st.binary(min_size=0, max_size=400)
_wurl = st.builds(lambda h, p: f"http://{h}.test/{p}",
                  st.text("abcdefgh", min_size=1, max_size=8),
                  st.text("abcdefgh0123456789", min_size=0, max_size=12))


@given(st.lists(st.tuples(_wurl, _payload), min_size=1, max_size=8),
       st.booleans())
@settings(max_examples=150, deadline=None)
def test_warc_roundtrip_property(records, member_gzip):
    built = [
        build_warc_record(u, p, record_id=f"<urn:x:{i}>")
        for i, (u, p) in enumerate(records)
    ]
    blob = build_warc_file(built, member_gzip=member_gzip)
    parsed = list(parse_warc_bytes(blob, source="s"))
    assert len(parsed) == len(records)
    for (u, p), rec in zip(records, parsed):
        assert rec["url"] == u
        assert rec["payload"] == p
        assert rec["payload_length"] == len(p)
        assert rec["http_status"] == 200


# ── PDF ──────────────────────────────────────────────────────────────

# page text: printable-ish unicode incl. the escape-relevant chars;
# lines must not themselves contain \n (the writer's line separator)
_line = st.text(
    st.characters(codec="utf-8", exclude_characters="\n\r",
                  exclude_categories=("Cs", "Cc")),
    min_size=0, max_size=40,
)
_page = st.builds(lambda ls: "\n".join(ls), st.lists(_line, min_size=1, max_size=6))


@given(st.lists(_page, min_size=1, max_size=4), st.booleans())
@settings(max_examples=150, deadline=None)
def test_pdf_roundtrip_property(pages, compress):
    meta, texts = parse_pdf(build_simple_pdf(pages, compress=compress))
    assert texts == pages
    assert meta["n_pages"] == len(pages)


# ── DER certificates ─────────────────────────────────────────────────

_attr_val = st.text(
    st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
    min_size=1, max_size=24,
)
_name_d = st.fixed_dictionaries(
    {}, optional={"CN": _attr_val, "O": _attr_val, "C": _attr_val, "OU": _attr_val}
).filter(bool)
_dns = st.text("abcdefghijklmnop0123456789.-", min_size=1, max_size=20)


@given(_name_d, _name_d, st.integers(min_value=1, max_value=2**64),
       st.lists(_dns, min_size=0, max_size=4))
@settings(max_examples=150, deadline=None)
def test_der_cert_roundtrip_property(subject, issuer, serial, sans):
    der = build_der_cert(subject, issuer, serial=serial, san=sans or None)
    info = parse_der_cert(der)
    assert info["subject"] == subject
    assert info["issuer"] == issuer
    assert info["serial_number"] == hex(serial)
    assert info["sans"] == (sans or [])


# ── cuckoo shard kernel ──────────────────────────────────────────────

@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=300, unique=True),
       st.integers(min_value=4, max_value=7))
@settings(max_examples=100, deadline=None)
def test_cuckoo_kernel_property(keys, m_log2):
    m = 1 << m_log2
    tab = np.zeros((m, 4), dtype=np.uint16)
    stash = np.zeros((0, 2), dtype=np.int64)
    arr = np.asarray(keys, dtype=np.int64)
    stash = _insert_shard(tab, stash, arr)
    # no false negatives, even far beyond designed load (stash path)
    assert _probe_shard(tab, stash, arr).all()
    # delete the first half: kept keys still all present
    half = len(arr) // 2
    if half:
        stash = _delete_shard(tab, stash, arr[:half])
        assert _probe_shard(tab, stash, arr[half:]).all()
