"""Client-identity columns (functions/client): Sec-CH-UA parity with
the reference branch table, deterministic UA/proxy rotation."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl4ai_spark.functions.client import (
    DEFAULT_UA_POOL,
    assign_proxies,
    assign_user_agents,
    parse_proxy_string,
    sec_ch_ua,
)


def _hints(spark, ua):
    return spark.range(1).select(sec_ch_ua(F.lit(ua)).alias("h")).collect()[0]["h"]


def test_sec_ch_ua_reference_cases(spark):
    # chrome only → Chromium + Not_A Brand + Google Chrome
    assert _hints(
        spark, "Mozilla/5.0 (X11) AppleWebKit/537.36 Chrome/120.0.0.0 Safari/537.36"
    ) == '"Chromium";v="120", "Not_A Brand";v="8", "Google Chrome";v="120"'
    # chrome + edge → Microsoft Edge replaces Google Chrome
    assert _hints(
        spark, "Mozilla/5.0 AppleWebKit/537.36 Chrome/120.0.0.0 Safari/537.36 Edg/119.0"
    ) == '"Chromium";v="120", "Not_A Brand";v="8", "Microsoft Edge";v="119"'
    # firefox → '""' (Firefox doesn't send Sec-CH-UA)
    assert _hints(spark, "Mozilla/5.0 (X11; rv:121.0) Gecko/20100101 Firefox/121.0") == '""'
    # safari (Version/x without Chrome) → Safari pair
    assert _hints(
        spark, "Mozilla/5.0 (Macintosh) AppleWebKit/605.1.15 Version/17.2 Safari/605.1.15"
    ) == '"Safari";v="17", "Not_A Brand";v="8"'


def test_assign_user_agents_deterministic(spark):
    df = spark.createDataFrame(
        [("http://a.test/1",), ("http://a.test/2",), ("http://a.test/1",)],
        "url string",
    )
    out = assign_user_agents(df, with_hints=True).collect()
    by_url = {}
    for r in out:
        assert r["user_agent"] in DEFAULT_UA_POOL
        assert r["sec_ch_ua"] is not None
        by_url.setdefault(r["url"], set()).add(r["user_agent"])
    # same key → same UA, every time
    assert all(len(s) == 1 for s in by_url.values())


def test_parse_proxy_string(spark):
    rows = spark.createDataFrame(
        [("10.0.0.1:8080",), ("10.0.0.2:3128:alice:secret",)], "p string"
    ).select(parse_proxy_string("p").alias("c")).collect()
    a, b = rows[0]["c"], rows[1]["c"]
    assert a["server"] == "http://10.0.0.1:8080" and a["ip"] == "10.0.0.1"
    assert a["username"] is None and a["password"] is None
    assert b["server"] == "http://10.0.0.2:3128"
    assert b["username"] == "alice" and b["password"] == "secret"


def test_assign_proxies_modes(spark):
    proxies = ["10.0.0.1:8080", "10.0.0.2:8080", "10.0.0.3:8080"]
    df = spark.createDataFrame(
        [(f"http://h.test/{i}", i) for i in range(9)], "url string, seq long"
    )
    seq = {r["seq"]: r["proxy"]["ip"] for r in
           assign_proxies(df, proxies, mode="seq").collect()}
    # exact round-robin over the admission sequence
    assert [seq[i] for i in range(6)] == [
        "10.0.0.1", "10.0.0.2", "10.0.0.3", "10.0.0.1", "10.0.0.2", "10.0.0.3"
    ]
    hashed = [r["proxy"]["ip"] for r in
              assign_proxies(df, proxies, mode="hash").collect()]
    assert set(hashed) <= {"10.0.0.1", "10.0.0.2", "10.0.0.3"}
    # empty pool → null column, no error
    none = assign_proxies(df, [], mode="seq").collect()
    assert all(r["proxy"] is None for r in none)


def test_parse_proxy_string_strict(spark):
    """Malformed part counts yield NULL structs (reference
    ProxyConfig.from_string raises for anything but 2 or 4 parts) —
    no silent credential dropping or truncation."""
    rows = spark.createDataFrame(
        [("10.0.0.1:8080:alice",),            # 3 parts: missing password
         ("10.0.0.1:8080:alice:pw:extra",),   # 5 parts: trailing junk
         ("",)],
        "p string",
    ).select(parse_proxy_string("p").alias("c")).collect()
    assert all(r["c"] is None for r in rows)


def test_assign_proxies_rejects_bad_literal_pool(spark):
    import pytest

    df = spark.createDataFrame([("http://h.test/1", 0)], "url string, seq long")
    with pytest.raises(ValueError, match="invalid proxy string"):
        assign_proxies(df, ["10.0.0.1:8080:alice"], mode="seq")
