"""URL canonicalization — the visited-set identity of the engine.

Clean-room implementations of the reference's canonicalization
semantics (behavioral spec: /root/reference/crawl4ai/utils.py —
`normalize_url` :2142-2225, `normalize_url_for_deep_crawl` :2228-2273,
`get_base_domain` :2340-2388, `is_external_url` :2391-2423). These are
pure functions used in three places:

1. inside the vectorized pandas UDFs (crawl4ai_spark.functions.udfs),
2. inside the pure-Python reference simulator (the parity oracle),
3. directly in unit tests (golden tables ported from
   /root/reference/tests/test_normalize_url.py).

Keeping one shared implementation guarantees the Spark engine and the
oracle agree on URL identity by construction; parity with the
*reference* is what the golden tests pin down.
"""

from __future__ import annotations

from urllib.parse import (
    parse_qs,
    parse_qsl,
    quote,
    unquote,
    urlencode,
    urljoin,
    urlparse,
    urlunparse,
)

# Tracking params dropped by the deep-crawl canonicalizer
# (spec: utils.py:2253 — note this is a *smaller* set than the full
# normalizer's; the two functions deliberately differ in the reference).
DEEP_CRAWL_TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "ref", "fbclid")

# Tracking params dropped by the full normalizer (spec: utils.py:2198-2201).
FULL_TRACKING_PARAMS = frozenset(
    {"utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content", "gclid", "fbclid", "ref", "ref_src"}
)

# Schemes that are always "external"/non-crawlable (spec: utils.py:2407).
SPECIAL_SCHEMES = ("mailto:", "tel:", "ftp:", "file:", "data:", "javascript:")

# Second-level labels that imply a 3-part base domain, e.g. co.uk
# (spec: utils.py:2368-2383).
_SECOND_LEVEL_LABELS = frozenset({"co", "com", "org", "gov", "edu", "net", "mil", "int", "ac", "ad", "ae", "af", "ag"})


def canonicalize_for_crawl(href: str | None, base_url: str) -> str | None:
    """Deep-crawl canonical form: defines frontier/seen-set identity.

    Semantics: resolve relative against base, lowercase host, drop the
    fragment, drop {utm_source, utm_medium, utm_campaign, ref, fbclid}
    query keys, re-encode the query grouped by first-occurrence key
    order (parse_qs → urlencode doseq), and strip ALL trailing slashes
    from the path.  Matches normalize_url_for_deep_crawl
    (utils.py:2228-2273) including its quirks — the quirks ARE the
    identity the reference's visited set uses.
    """
    if not href:
        return None
    full = urljoin(base_url, href.strip())
    p = urlparse(full)
    query = p.query
    if query:
        params = parse_qs(query)
        for k in DEEP_CRAWL_TRACKING_PARAMS:
            params.pop(k, None)
        query = urlencode(params, doseq=True) if params else ""
    return urlunparse((p.scheme, p.netloc.lower(), p.path.rstrip("/"), p.params, query, ""))


def cheap_canonicalize(href: str | None, base_url: str) -> str | None:
    """C3 cheap variant (efficient_normalize_url_for_deep_crawl,
    utils.py:2276-2301): urljoin + lowercase host + drop fragment
    ONLY — no query rewriting, no trailing-slash strip.  Used where
    full canonical identity isn't needed (e.g. pre-filter passes)."""
    if not href:
        return None
    full = urljoin(base_url, href.strip())
    p = urlparse(full)
    return urlunparse((p.scheme, p.netloc.lower(), p.path, p.params, p.query, ""))


def normalize_url(
    href: str | None,
    base_url: str,
    *,
    drop_query_tracking: bool = True,
    sort_query: bool = True,
    keep_fragment: bool = False,
    extra_drop_params=None,
) -> str | None:
    """Full normalizer (link de-dup / cache key): percent-re-encode the
    path, lowercase query keys, drop the larger tracking set, sort query
    keys, keep root '/'.  Semantics of utils.py:2142-2225."""
    if not href:
        return None
    full = urljoin(base_url, href.strip())
    p = urlparse(full)
    netloc = p.netloc.lower()
    path = quote(unquote(p.path))
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")
    query = p.query
    if query:
        pairs = [(k.lower(), v) for k, v in parse_qsl(query, keep_blank_values=True)]
        if drop_query_tracking:
            drop = set(FULL_TRACKING_PARAMS)
            if extra_drop_params:
                drop |= {x.lower() for x in extra_drop_params}
            pairs = [(k, v) for k, v in pairs if k not in drop]
        if sort_query:
            pairs.sort(key=lambda kv: kv[0])
        query = urlencode(pairs, doseq=True) if pairs else ""
    fragment = p.fragment if keep_fragment else ""
    return urlunparse((p.scheme, netloc, path, p.params, query, fragment))


def get_host(url: str) -> str:
    """netloc, lowercased, port kept — the politeness partition key.

    The reference rate-limits on the raw netloc (urlparse(url).netloc,
    async_dispatcher.py:56) — not on the registrable base domain.
    """
    try:
        return urlparse(url).netloc.lower()
    except (ValueError, AttributeError):
        return ""


def get_base_domain(url: str) -> str:
    """Registrable base domain: strip port + www., keep 2 labels, or 3
    when the 2nd-level label is a known public-suffix label (co.uk
    style).  Semantics of utils.py:2340-2388."""
    try:
        domain = urlparse(url).netloc.lower()
        if not domain:
            return ""
        domain = domain.split(":")[0]
        if domain.startswith("www."):
            domain = domain[4:]
        parts = domain.split(".")
        if len(parts) > 2 and parts[-2] in _SECOND_LEVEL_LABELS:
            return ".".join(parts[-3:])
        return ".".join(parts[-2:])
    except (ValueError, AttributeError):
        return ""


def is_external_url(url: str, base_domain: str) -> bool:
    """True if url points off the base domain.  Special schemes are
    always external; relative URLs never are; otherwise suffix-compare
    netlocs with 'www.' removed.  Semantics of utils.py:2391-2423."""
    low = url.lower()
    if any(low.startswith(s) for s in SPECIAL_SCHEMES):
        return True
    try:
        p = urlparse(url)
        if not p.netloc:
            return False
        return not p.netloc.lower().replace("www.", "").endswith(base_domain.lower().replace("www.", ""))
    except (ValueError, AttributeError):
        return False


def is_valid_crawl_url(url: str) -> bool:
    """URL well-formedness gate: http(s) scheme, netloc present and
    dotted.  Semantics of bfs_strategy.py:46-66 / bff_strategy.py:55-75."""
    try:
        p = urlparse(url)
    except (ValueError, AttributeError):
        return False
    return bool(p.scheme) and p.scheme in ("http", "https") and bool(p.netloc) and "." in p.netloc


def url_depth(url: str) -> int:
    """Path-segment depth: '' or '/' → 0, '/a' → 1, '/a/b' → 2.
    Semantics of PathDepthScorer._quick_depth (scorers.py:190-230)."""
    pos = url.find("/", url.find("://") + 3)
    if pos == -1:
        return 0
    path = url[pos:]
    if not path or path == "/":
        return 0
    return len([seg for seg in path.split("/") if seg])
