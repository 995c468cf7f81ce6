"""Client-identity columns: user agents, Sec-CH-UA client hints,
proxy rotation.

Clean-room re-expression of the reference's client plumbing as
native Catalyst columns (zero Python in the hot path):

* `sec_ch_ua` ≡ `user_agent_generator.py:24-66`
  `generate_client_hints`: parse the UA's Chrome/Edg/Version/Firefox
  version tokens and assemble the Sec-CH-UA header (Firefox → '""',
  Edge implies the Chromium pair, Safari its own pair).
* `assign_user_agents` ≡ `ValidUAGenerator.generate`
  (user_agent_generator.py:68-88): the reference delegates to the
  fake-useragent pool and returns a random member; distributed
  crawls need the choice DETERMINISTIC per URL (retries and resumed
  runs must present the same identity), so the re-expression picks
  from the pool by `pmod(xxhash64(key), n)` — uniform like `random`,
  stable per key.
* `parse_proxy_string` / `assign_proxies` ≡ `proxy_strategy.py:47-66`
  (`ProxyConfig.from_string`: ip:port[:user:pass] → http server URL)
  and :134-158 (`RoundRobinProxyStrategy`).  An async round-robin
  cycle is driver state a cluster cannot share; the distributed
  equivalents are `mode="seq"` — pmod over the admission sequence
  number, the exact round-robin analogue under the engine's
  deterministic seq — and `mode="hash"` (per-URL sticky proxy, what
  per-host session affinity wants).

All pure Column expressions → whole-stage codegen, usable directly
inside the admission projection at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DEFAULT_UA_POOL",
    "FALLBACK_UA",
    "sec_ch_ua",
    "assign_user_agents",
    "parse_proxy_string",
    "assign_proxies",
]

# the reference's fallback (user_agent_generator.py:78) + a small
# desktop Chrome/Firefox/Edge pool in its default browser/os mix
FALLBACK_UA = (
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
    "Chrome/116.0.0.0 Safari/537.36"
)
DEFAULT_UA_POOL = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.0.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) "
    "Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:120.0) "
    "Gecko/20100101 Firefox/120.0",
    FALLBACK_UA,
]


def sec_ch_ua(ua: Column | str) -> Column:
    """Sec-CH-UA header value from a user-agent column — the
    reference's branch structure verbatim: Chrome ⇒ Chromium pair +
    (Edge | Google Chrome); Firefox ⇒ '""'; Safari ⇒ Safari pair."""
    ua = F.col(ua) if isinstance(ua, str) else ua
    chrome = F.regexp_extract(ua, r"Chrome/(\d+)", 1)
    edge = F.regexp_extract(ua, r"Edg/(\d+)", 1)
    safari = F.regexp_extract(ua, r"Version/(\d+)", 1)
    firefox = F.regexp_extract(ua, r"Firefox/(\d+)", 1)

    chromium_pair = F.concat(
        F.lit('"Chromium";v="'), chrome, F.lit('", "Not_A Brand";v="8"')
    )
    with_edge = F.concat(
        chromium_pair, F.lit(', "Microsoft Edge";v="'), edge, F.lit('"')
    )
    with_chrome = F.concat(
        chromium_pair, F.lit(', "Google Chrome";v="'), chrome, F.lit('"')
    )
    safari_hints = F.concat(
        F.lit('"Safari";v="'), safari, F.lit('", "Not_A Brand";v="8"')
    )
    return (
        F.when(chrome != "", F.when(edge != "", with_edge).otherwise(with_chrome))
        .when(firefox != "", F.lit('""'))
        .when(safari != "", safari_hints)
        .otherwise(F.lit(""))
    )


def assign_user_agents(
    df: DataFrame,
    key_col: str = "url",
    pool: list[str] | None = None,
    out_col: str = "user_agent",
    with_hints: bool = False,
) -> DataFrame:
    """Deterministic per-key UA from the pool (+ optional Sec-CH-UA
    column) — `element_at(pool, pmod(xxhash64(key), n) + 1)`."""
    pool = pool or DEFAULT_UA_POOL
    arr = F.array(*[F.lit(u) for u in pool])
    idx = F.pmod(F.xxhash64(key_col), F.lit(len(pool))).cast("int") + F.lit(1)
    out = df.withColumn(out_col, F.element_at(arr, idx))
    if with_hints:
        out = out.withColumn("sec_ch_ua", sec_ch_ua(F.col(out_col)))
    return out


def parse_proxy_string(s: Column | str) -> Column:
    """struct(server, username, password, ip) from 'ip:port' or
    'ip:port:user:pass' (ProxyConfig.from_string semantics; the
    2-part form leaves credentials null).

    Strict like the reference's `ProxyConfig.from_string` (which
    raises ValueError for anything but 2 or 4 parts): a malformed
    3-part 'ip:port:user' or 5+-part string yields a NULL struct
    instead of silently dropping credentials — misconfigured proxies
    surface as nulls, not as credential-less fetches."""
    s = F.col(s) if isinstance(s, str) else s
    parts = F.split(s, ":")
    n = F.size(parts)
    four = n == 4
    valid = (n == 2) | four
    ip = F.element_at(parts, 1)
    server = F.concat(F.lit("http://"), ip, F.lit(":"), F.element_at(parts, 2))
    return F.when(
        valid,
        F.struct(
            server.alias("server"),
            F.when(four, F.element_at(parts, 3)).alias("username"),
            F.when(four, F.element_at(parts, 4)).alias("password"),
            ip.alias("ip"),
        ),
    )


def assign_proxies(
    df: DataFrame,
    proxies: list[str],
    mode: str = "seq",
    key_col: str = "url",
    seq_col: str = "seq",
    out_col: str = "proxy",
) -> DataFrame:
    """Rotate the proxy pool over the batch.

    mode="seq": pmod(seq, n) — the deterministic distributed
    round-robin (consecutive admissions walk the pool in order, like
    the reference's cycle, but reproducible under retry/resume).
    mode="hash": pmod(xxhash64(key), n) — sticky per-URL proxy."""
    if not proxies:
        return df.withColumn(out_col, F.lit(None).cast(
            "struct<server:string,username:string,password:string,ip:string>"
        ))
    for p in proxies:  # literal pool: fail at plan build, not per row
        if len(p.split(":")) not in (2, 4):
            raise ValueError(
                f"invalid proxy string {p!r}: expected 'ip:port' or "
                "'ip:port:user:pass' (ProxyConfig.from_string semantics)"
            )
    n = len(proxies)
    arr = F.array(*[parse_proxy_string(F.lit(p)) for p in proxies])
    if mode == "seq":
        idx = F.pmod(F.col(seq_col), F.lit(n)).cast("int") + F.lit(1)
    elif mode == "hash":
        idx = F.pmod(F.xxhash64(key_col), F.lit(n)).cast("int") + F.lit(1)
    else:
        raise ValueError(f"unknown proxy rotation mode: {mode}")
    return df.withColumn(out_col, F.element_at(arr, idx))
