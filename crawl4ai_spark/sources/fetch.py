"""The fetch seam (S5): a pluggable per-partition transport behind
one Arrow UDF, so the synthetic corpus join and a real network fetch
are interchangeable engine configurations.

Behavioral spec: /root/reference/crawl4ai/async_crawler_strategy.py
:2153-2393 (AsyncHTTPCrawlerStrategy) —
- valid schemes http/https/file/raw (:2166);
- 2xx gate: any other status is a fetch error (:2325-2329);
- charset: response header, else detector, else utf-8, decoded with
  errors='replace' (:2331-2336);
- redirects followed in-transport, final URL reported (:2340);
- file:// reads the local path, raw: echoes its payload, both
  status 200 (:2267-2286);
- bounded connection pool (max_connections = min(32, 4·cpu), :2162).

Spark shape: `make_fetch_udf(factory)` produces ONE pandas UDF whose
transport is created lazily per executor process and reused across
Arrow batches (connection pooling survives the whole stage — the
Spark analogue of the reference's shared aiohttp session).  The
engine repartitions the admitted batch by (host, salt) before this
UDF at real-fetch time so a transport sees mostly same-host URLs
(connection reuse) without letting one hot host serialize the stage.

Transports:
- SyntheticTransport: dict-backed corpus with one-hop redirects —
  the parity-testable stand-in (mirrors the engine's corpus join).
- UrllibTransport: stdlib real-network transport (http/https/file/
  raw) with a bounded thread pool — no extra dependencies.
- AiohttpTransport: the reference-matching async client, gated
  behind an import-try (aiohttp is absent in this sandbox).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Protocol
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

__all__ = [
    "FetchResult",
    "Transport",
    "SyntheticTransport",
    "UrllibTransport",
    "AiohttpTransport",
    "FETCH_RESULT",
    "make_fetch_udf",
    "make_paced_fetch_udf",
    "make_head_probe_udf",
    "head_probe_one",
]

VALID_SCHEMES = frozenset({"http", "https", "file", "raw"})

FETCH_RESULT = StructType(
    [
        StructField("status_code", IntegerType()),
        StructField("html", StringType()),
        StructField("final_url", StringType()),
        StructField("error", StringType()),
    ]
)


@dataclass
class FetchResult:
    status_code: int
    html: str | None
    final_url: str
    error: str | None = None


class Transport(Protocol):
    def fetch_batch(self, urls: list[str]) -> list[FetchResult]: ...


def _decode(content: bytes, charset: str | None) -> str:
    enc = charset or "utf-8"
    try:
        return content.decode(enc, errors="replace")
    except LookupError:
        return content.decode("utf-8", errors="replace")


class SyntheticTransport:
    """Corpus-dict transport with the engine's one-hop 301 semantics:
    a 301 row with a known redirect_to resolves to the target's
    status/html and reports the target as final_url."""

    def __init__(self, pages: dict[str, dict]):
        self.pages = pages

    def fetch_batch(self, urls: list[str]) -> list[FetchResult]:
        out = []
        for u in urls:
            row = self.pages.get(u)
            if row is None:
                out.append(FetchResult(0, None, u, "not_found"))
                continue
            status, html, final = int(row["status_code"]), row.get("html"), u
            if status == 301 and row.get("redirect_to"):
                tgt = self.pages.get(row["redirect_to"])
                final = row["redirect_to"]
                status = int(tgt["status_code"]) if tgt else 0
                html = tgt.get("html") if tgt else None
            out.append(FetchResult(status, html, final, None))
        return out


class ParquetSyntheticTransport(SyntheticTransport):
    """SyntheticTransport whose corpus loads from a parquet file ONCE
    per executor process (the bench's real-fetch stand-in: fetch cost
    is O(batch) dict lookups, like a network fetch — not an O(corpus)
    join probe per superstep)."""

    def __init__(self, path: str):
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["url", "status_code", "redirect_to", "html"])
        urls = t.column("url").to_pylist()
        status = t.column("status_code").to_pylist()
        rts = t.column("redirect_to").to_pylist()
        htmls = t.column("html").to_pylist()
        pages = {
            u: {"status_code": s, "redirect_to": r, "html": h}
            for u, s, r, h in zip(urls, status, rts, htmls)
        }
        super().__init__(pages)


class UrllibTransport:
    """Stdlib real-network transport: http/https via urllib with a
    bounded thread pool (the sync analogue of the reference's
    connection-limited session), plus file:// and raw:."""

    def __init__(self, timeout: float = 30.0, max_connections: int | None = None,
                 user_agent: str = "crawl4ai-spark"):
        import os

        self.timeout = timeout
        self.max_connections = max_connections or min(32, (os.cpu_count() or 1) * 4)
        self.user_agent = user_agent

    def _fetch_one(self, url: str) -> FetchResult:
        scheme = urlparse(url).scheme.rstrip("/")
        if scheme not in VALID_SCHEMES:
            return FetchResult(0, None, url, f"unsupported scheme: {scheme}")
        try:
            if scheme == "raw":
                return FetchResult(200, url[len("raw:"):], url, None)
            if scheme == "file":
                path = urlparse(url).path
                with open(path, "rb") as f:
                    return FetchResult(200, _decode(f.read(), None), url, None)
            import urllib.request

            req = urllib.request.Request(url, headers={"User-Agent": self.user_agent})
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                status = resp.status
                final = resp.geturl()
                if not (200 <= status < 300):
                    return FetchResult(status, None, final, f"status {status}")
                charset = resp.headers.get_content_charset()
                return FetchResult(status, _decode(resp.read(), charset), final, None)
        except Exception as e:  # noqa: BLE001 — the row records the error
            status = getattr(e, "code", 0) or 0
            return FetchResult(int(status), None, url, f"{type(e).__name__}: {e}")

    def fetch_batch(self, urls: list[str]) -> list[FetchResult]:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.max_connections) as pool:
            return list(pool.map(self._fetch_one, urls))


class AiohttpTransport:
    """Reference-matching async transport (requires aiohttp; absent
    in this sandbox, so construction raises ImportError and the
    engine must be given one of the other transports)."""

    def __init__(self, timeout: float = 30.0, max_connections: int | None = None,
                 user_agent: str = "crawl4ai-spark"):
        import os

        import aiohttp  # noqa: F401 — fail fast if unavailable

        self.timeout = timeout
        self.max_connections = max_connections or min(32, (os.cpu_count() or 1) * 4)
        self.user_agent = user_agent

    def fetch_batch(self, urls: list[str]) -> list[FetchResult]:
        import asyncio

        return asyncio.run(self._fetch_all(urls))

    async def _fetch_all(self, urls: list[str]) -> list[FetchResult]:
        import aiohttp

        connector = aiohttp.TCPConnector(limit=self.max_connections, ttl_dns_cache=300)
        timeout = aiohttp.ClientTimeout(total=self.timeout, connect=10, sock_read=30)
        async with aiohttp.ClientSession(
            connector=connector, timeout=timeout,
            headers={"User-Agent": self.user_agent},
        ) as session:
            sem = __import__("asyncio").Semaphore(self.max_connections)

            async def one(url: str) -> FetchResult:
                scheme = urlparse(url).scheme.rstrip("/")
                if scheme == "raw":
                    return FetchResult(200, url[len("raw:"):], url, None)
                if scheme == "file":
                    try:
                        with open(urlparse(url).path, "rb") as f:
                            return FetchResult(200, _decode(f.read(), None), url, None)
                    except OSError as e:
                        return FetchResult(0, None, url, str(e))
                if scheme not in VALID_SCHEMES:
                    return FetchResult(0, None, url, f"unsupported scheme: {scheme}")
                try:
                    async with sem, session.get(url, allow_redirects=True) as resp:
                        content = await resp.read()
                        if not (200 <= resp.status < 300):
                            return FetchResult(resp.status, None, str(resp.url),
                                               f"status {resp.status}")
                        return FetchResult(
                            resp.status, _decode(content, resp.charset), str(resp.url), None
                        )
                except Exception as e:  # noqa: BLE001
                    return FetchResult(0, None, url, f"{type(e).__name__}: {e}")

            import asyncio

            return list(await asyncio.gather(*[one(u) for u in urls]))


def head_probe_one(transport: Transport, pages: dict | None, url: str,
                   timeout: float = 10.0) -> str | None:
    """HEAD liveness semantics (S8, async_url_seeder.py:679-706):
    2xx → the URL itself; single 3xx → absolute redirect target;
    anything else → None.  For the SyntheticTransport the corpus row's
    status stands in for the HEAD response."""
    from urllib.parse import urljoin

    if pages is not None:  # synthetic corpus
        row = pages.get(url)
        if row is None:
            return None
        status = int(row["status_code"])
        if 200 <= status < 300:
            return url
        if status in (301, 302, 303, 307, 308) and row.get("redirect_to"):
            return urljoin(url, row["redirect_to"])
        return None
    import urllib.request

    try:
        req = urllib.request.Request(url, method="HEAD")

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, *a, **k):  # noqa: D401
                return None

        opener = urllib.request.build_opener(_NoRedirect)
        with opener.open(req, timeout=timeout) as resp:
            if 200 <= resp.status < 300:
                return url
            return None
    except Exception as e:  # noqa: BLE001
        code = getattr(e, "code", None)
        if code in (301, 302, 303, 307, 308):
            loc = getattr(e, "headers", {}).get("location") if hasattr(e, "headers") else None
            if loc:
                return urljoin(url, loc)
        return None


def make_head_probe_udf(transport_factory: Callable[[], Transport]):
    """(url) → alive final URL or null — the seeder's HEAD gate."""
    key = ("head", id(transport_factory))

    @pandas_udf(StringType())
    def head_udf(url: pd.Series) -> pd.Series:
        t = _TRANSPORTS.get(key)
        if t is None:
            t = transport_factory()
            _TRANSPORTS[key] = t
        pages = t.pages if isinstance(t, SyntheticTransport) else None
        return pd.Series(
            [head_probe_one(t, pages, u if isinstance(u, str) else "") for u in url],
            dtype=object,
        )

    return head_udf


# per-executor transport cache: one live transport per factory object,
# shared by every Arrow batch of every task in the process
_TRANSPORTS: dict = {}

# ── in-UDF same-host pacing (P1 variant b) ────────────────────────────
# Wall-clock inter-request delay between SAME-HOST requests inside the
# fetch UDF — the reference RateLimiter.wait_if_needed semantics
# (async_dispatcher.py:45-63: sleep until current_delay has elapsed
# since the host's last request, then stamp).  State is per executor
# PROCESS; the engine repartitions the admitted batch by host before
# the fetch UDF, so a host's requests co-locate and process-local
# pacing is globally correct for that host.  Unlike the reference, the
# delay VALUE is not mutated here — backoff/decay live in the engine's
# host-state merge (J5/A4), and the paced UDF receives the current
# per-host delay as a column.

_HOST_LAST: dict[str, float] = {}
_HOST_LOCKS: dict = {}
_PACE_GUARD = None  # created lazily: a threading.Lock


def _pace_host(host: str, delay: float) -> None:
    """Block until `delay` seconds have passed since this process last
    fetched from `host`, then stamp the new request time."""
    import threading
    import time as _time

    global _PACE_GUARD
    if _PACE_GUARD is None:
        _PACE_GUARD = threading.Lock()
    with _PACE_GUARD:
        lock = _HOST_LOCKS.setdefault(host, threading.Lock())
    with lock:
        last = _HOST_LAST.get(host)
        if last is not None and delay > 0:
            wait = delay - (_time.monotonic() - last)
            if wait > 0:
                _time.sleep(wait)
        _HOST_LAST[host] = _time.monotonic()


def make_paced_fetch_udf(
    transport_factory: Callable[[], Transport], cache_key: str | None = None,
    max_parallel_hosts: int = 16,
):
    """(url, delay_sec) → struct(status_code, html, final_url, error).

    Same transport caching as `make_fetch_udf`, plus per-host pacing:
    within an Arrow batch, same-host URLs fetch SEQUENTIALLY with
    ≥ delay_sec spacing (enforced against the process-wide last-request
    stamp, so spacing holds across batches and tasks in the process
    too); distinct hosts proceed in parallel.  Null/empty URLs (cache
    hits) skip pacing and return the transport's not-found row, like
    the unpaced UDF."""
    key = cache_key or id(transport_factory)

    @pandas_udf(FETCH_RESULT)
    def paced_fetch_udf(url: pd.Series, delay_sec: pd.Series) -> pd.DataFrame:
        from concurrent.futures import ThreadPoolExecutor

        t = _TRANSPORTS.get(key)
        if t is None:
            t = transport_factory()
            _TRANSPORTS[key] = t
        urls = [u if isinstance(u, str) else "" for u in url]
        delays = [float(d) if d == d and d is not None else 0.0 for d in delay_sec]
        results: list[FetchResult | None] = [None] * len(urls)

        groups: dict[str, list[int]] = {}
        for i, u in enumerate(urls):
            host = urlparse(u).netloc if u else ""
            groups.setdefault(host, []).append(i)

        def run_host(host: str, idxs: list[int]) -> None:
            for i in idxs:
                if urls[i] and host:
                    _pace_host(host, delays[i])
                results[i] = t.fetch_batch([urls[i]])[0]

        if len(groups) == 1:
            [(h, idxs)] = groups.items()
            run_host(h, idxs)
        else:
            with ThreadPoolExecutor(
                max_workers=max(1, min(len(groups), max_parallel_hosts))
            ) as pool:
                list(pool.map(lambda kv: run_host(*kv), groups.items()))

        return pd.DataFrame(
            [
                {"status_code": r.status_code, "html": r.html,
                 "final_url": r.final_url, "error": r.error}
                for r in results  # type: ignore[union-attr]
            ]
        )

    return paced_fetch_udf


def make_fetch_udf(transport_factory: Callable[[], Transport], cache_key: str | None = None):
    """(url) → struct(status_code, html, final_url, error).  The
    factory runs lazily inside the executor; its product is cached per
    process so connection pools (or a loaded synthetic corpus) persist
    across batches AND tasks.  Pass `cache_key` when the factory is
    re-pickled per task (e.g. a functools.partial) — id() of a fresh
    unpickle differs every task and would defeat the cache."""
    key = cache_key or id(transport_factory)

    @pandas_udf(FETCH_RESULT)
    def fetch_udf(url: pd.Series) -> pd.DataFrame:
        t = _TRANSPORTS.get(key)
        if t is None:
            t = transport_factory()
            _TRANSPORTS[key] = t
        results = t.fetch_batch([u if isinstance(u, str) else "" for u in url])
        return pd.DataFrame(
            [
                {"status_code": r.status_code, "html": r.html,
                 "final_url": r.final_url, "error": r.error}
                for r in results
            ]
        )

    return fetch_udf
