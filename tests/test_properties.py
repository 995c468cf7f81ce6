"""Property-based tests (hypothesis) over the deterministic operators.

Pure-Python properties (url normalization) run at full hypothesis
speed; Spark-side properties evaluate one DataFrame per generated
example (a LIST of inputs), so Spark job latency is amortized across
the whole example rather than paid per case.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawl4ai_spark.functions.urlnorm import (
    get_base_domain, get_host, normalize_url, url_depth,
)

# ── URL grammar ──────────────────────────────────────────────────────

_label = st.text("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-", min_size=1, max_size=8)
_host = st.builds(lambda ls: ".".join(ls), st.lists(_label, min_size=1, max_size=4))
_seg = st.text("abcdefghijklmnopqrstuvwxyz0123456789._~%-", min_size=0, max_size=6)
_path = st.builds(lambda segs: "/" + "/".join(segs), st.lists(_seg, min_size=0, max_size=4))
_query = st.one_of(
    st.just(""),
    st.builds(lambda kvs: "?" + "&".join(f"{k}={v}" for k, v in kvs),
              st.lists(st.tuples(_label, _seg), min_size=1, max_size=3)),
)
_frag = st.one_of(st.just(""), st.builds(lambda s: "#" + s, _seg))
_scheme = st.sampled_from(["http", "https", "HTTP", "HTTPS"])
_url = st.builds(lambda s, h, p, q, f: f"{s}://{h}{p}{q}{f}",
                 _scheme, _host, _path, _query, _frag)


@given(_url)
@settings(max_examples=300, deadline=None)
def test_normalize_url_idempotent(url):
    once = normalize_url(url, url)
    assert normalize_url(once, once) == once


@given(_url)
@settings(max_examples=300, deadline=None)
def test_normalize_url_invariants(url):
    n = normalize_url(url, url)
    scheme, rest = n.split("://", 1)
    assert scheme == scheme.lower()
    host = rest.split("/", 1)[0].split("?", 1)[0]
    assert host == host.lower()
    assert "#" not in n  # fragments never survive


@given(_url)
@settings(max_examples=300, deadline=None)
def test_host_and_depth_consistency(url):
    host = get_host(url)
    assert host == host.lower()
    base = get_base_domain(url)
    assert base == "" or host == base or host.endswith("." + base) or base in host
    assert url_depth(url) >= 0


# ── Spark-side properties (one DataFrame per example) ────────────────

_ascii_text = st.text(
    "abcdefghijklmnopqrstuvwxyz .\n-#?!", min_size=0, max_size=120
)


@given(st.lists(_ascii_text, min_size=1, max_size=30))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_repetition_fractions_bounded(spark, texts):
    from crawl4ai_spark.operators import repetition as R

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rep = R.gopher_repetition("text")
    rows = df.select(
        rep["dup_line_frac"].alias("dlf"),
        rep["dup_line_char_frac"].alias("dlcf"),
        rep["top_2gram_char_frac"].alias("t2"),
        rep["top_3gram_char_frac"].alias("t3"),
    ).collect()
    for r in rows:
        assert 0.0 <= r.dlf <= 1.0
        assert 0.0 <= r.dlcf <= 1.0
        # the top n-gram's occurrences cover at most every word char
        assert 0.0 <= r.t2 <= 1.0 + 1e-9
        assert 0.0 <= r.t3 <= 1.0 + 1e-9


@given(st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_packing_tiles_exactly(spark, weights):
    from crawl4ai_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id int, n_tokens int"
    )
    rows = pack_sequences(df, "doc_id", "n_tokens", seq_len=64, n_buckets=3).collect()
    assert len(rows) == len(weights)
    streams: dict[int, list] = {}
    for r in rows:
        streams.setdefault(r.bucket, []).append(r)
    for grp in streams.values():
        off = 0
        for r in sorted(grp, key=lambda r: r.start_offset):
            assert r.start_offset == off
            off += r.n_tokens


@given(st.lists(st.text("abc123xyz@._ ", min_size=0, max_size=40), min_size=1, max_size=30))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_redaction_is_idempotent(spark, texts):
    from crawl4ai_spark.operators.pii import redact_pii

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        redact_pii("text").alias("once"),
        redact_pii(redact_pii("text")).alias("twice"),
    ).collect()
    for r in rows:
        assert r.once == r.twice
