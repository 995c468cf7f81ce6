"""SSL certificate subset codec (sources/ssl_cert): DER round-trip,
SANs, PEM export, degradation on junk, Spark dim surface."""

from __future__ import annotations

import base64
import hashlib

from crawl4ai_spark.sources.ssl_cert import (
    build_der_cert,
    cert_to_pem,
    parse_certs,
    parse_der_cert,
)


def _cert(**kw):
    return build_der_cert(
        subject={"CN": "www.example.test", "O": "Example Org"},
        issuer={"CN": "Example CA", "O": "Example Trust", "C": "US"},
        serial=0x1A2B3C,
        san=["www.example.test", "example.test", "cdn.example.test"],
        **kw,
    )


def test_der_roundtrip():
    der = _cert()
    info = parse_der_cert(der)
    assert info["subject"] == {"CN": "www.example.test", "O": "Example Org"}
    assert info["issuer"] == {"CN": "Example CA", "O": "Example Trust", "C": "US"}
    assert info["serial_number"] == hex(0x1A2B3C)
    assert info["not_before"] == "240101000000Z"
    assert info["not_after"] == "260101000000Z"
    assert info["sans"] == ["www.example.test", "example.test", "cdn.example.test"]
    assert info["fingerprint"] == hashlib.sha256(der).hexdigest()
    assert base64.b64decode(info["raw_cert"]) == der


def test_no_san_and_unicode_names():
    der = build_der_cert(subject={"CN": "ünïcode.test"}, issuer={"CN": "CA"}, serial=7)
    info = parse_der_cert(der)
    assert info["subject"]["CN"] == "ünïcode.test"
    assert info["sans"] == []


def test_pem_export():
    der = _cert()
    pem = cert_to_pem(der)
    assert pem.startswith("-----BEGIN CERTIFICATE-----\n")
    assert pem.rstrip().endswith("-----END CERTIFICATE-----")
    body = "".join(
        l for l in pem.splitlines() if l and not l.startswith("-----")
    )
    assert base64.b64decode(body) == der


def test_junk_degrades_without_raising():
    info = parse_der_cert(b"\x00\x01not a cert")
    assert info["subject"] == {} and info["sans"] == []
    assert info["fingerprint"] == hashlib.sha256(b"\x00\x01not a cert").hexdigest()


def test_parse_certs_spark_dim(spark):
    rows = [
        ("a.test", bytearray(build_der_cert(
            subject={"CN": "a.test"}, issuer={"CN": "CA-1", "O": "Org1"},
            serial=1, san=["a.test", "www.a.test"]))),
        ("b.test", bytearray(build_der_cert(
            subject={"CN": "b.test"}, issuer={"CN": "CA-2", "O": "Org2"},
            serial=2, not_after="250601000000Z"))),
    ]
    df = spark.createDataFrame(rows, "host string, der binary")
    got = {r["host"]: r for r in parse_certs(df).collect()}
    assert got["a.test"]["subject_cn"] == "a.test"
    assert got["a.test"]["issuer_o"] == "Org1"
    assert list(got["a.test"]["sans"]) == ["a.test", "www.a.test"]
    assert got["b.test"]["not_after"] == "250601000000Z"
    assert got["b.test"]["serial_number"] == "0x2"
    plan = parse_certs(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
