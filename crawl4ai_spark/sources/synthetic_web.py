"""Deterministic synthetic web: a seeded host-skewed link graph with
media-bearing HTML (FIXTURES.md §2).

Every page is a pure function of (page_id, config) via splitmix64
hashing — no global RNG, no driver-side state — so the corpus
generates distributively with `spark.range(n).mapInPandas(...)` and
any single page can be re-derived anywhere (simulator, tests, bench)
bit-for-bit.

Graph shape (FIXTURES.md): one hot host holding ~40% of all URLs
(skew / politeness-budget stress), power-law-ish out-degree 2-40,
~15% cross-host links, unreachable island pages (last 5% of ids are
never linked to — a correct crawl must NOT visit them), dirty href
variants (relative, absolute, uppercase-host, fragment, tracking
params, trailing slash) that canonicalization must collapse, and
status-code faults (404 / 429 / 503 / 301) to exercise retry/backoff
(async_dispatcher.py:65-85 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import pandas as pd

MASK64 = (1 << 64) - 1


def splitmix64(x: int) -> int:
    """Public-domain splitmix64 mix function — the per-page PRNG."""
    x = (x + 0x9E3779B97F4A7C15) & MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK64
    return (x ^ (x >> 31)) & MASK64


def _h(seed: int, *parts: int) -> int:
    x = seed & MASK64
    for p in parts:
        x = splitmix64(x ^ (p & MASK64))
    return x


@dataclass(frozen=True)
class WebConfig:
    n_pages: int = 200
    n_hosts: int = 8
    seed: int = 42
    hot_share: float = 0.40      # fraction of pages on host 0
    island_share: float = 0.05   # trailing ids that are never linked to
    cross_host: float = 0.15     # probability a link leaves the host
    fault_every: int = 25        # 1/N pages get a non-200 status
    richness: int = 1            # content multiplier: paragraphs/images
                                 # per page scale ~linearly (richness 8
                                 # ≈ a 20-25 KB real-web page)

    @property
    def n_reachable(self) -> int:
        return max(2, int(self.n_pages * (1.0 - self.island_share)))

    def host_of(self, i: int) -> int:
        hot = int(self.n_pages * self.hot_share)
        if i < hot:
            return 0
        rest = self.n_pages - hot
        per = max(1, rest // max(1, self.n_hosts - 1))
        return min(self.n_hosts - 1, 1 + (i - hot) // per)

    def host_range(self, h: int) -> tuple[int, int]:
        """[start, end) of page ids on host h (reachable part only)."""
        hot = int(self.n_pages * self.hot_share)
        if h == 0:
            return (0, min(hot, self.n_reachable))
        rest = self.n_pages - hot
        per = max(1, rest // max(1, self.n_hosts - 1))
        start = hot + (h - 1) * per
        end = hot + h * per if h < self.n_hosts - 1 else self.n_pages
        return (start, min(end, self.n_reachable))

    def host_name(self, h: int) -> str:
        return f"h{h:04d}.example.test"


# ── URL layout ─────────────────────────────────────────────────────────

_SECTIONS = ["docs", "blog", "articles", "products", "private", "research"]
_WORDS = [
    "spark", "frontier", "crawl", "scale", "shuffle", "partition", "vector",
    "lattice", "signal", "cursor", "beacon", "kernel", "tensor", "atlas",
    "quorum", "ledger", "mosaic", "prism", "relay", "schema",
]


def canonical_url(i: int, cfg: WebConfig) -> str:
    """The page's canonical URL — already in canonicalize_for_crawl
    normal form (lowercase host, no trailing slash, no tracking)."""
    h = cfg.host_of(i)
    r = _h(cfg.seed, 11, i)
    section = _SECTIONS[r % len(_SECTIONS)]
    year = 2019 + (r >> 8) % 6
    w1 = _WORDS[(r >> 16) % len(_WORDS)]
    style = (r >> 24) % 4
    if style == 0:
        path = f"/{section}/{year}/{w1}-{i}.html"
    elif style == 1:
        path = f"/{section}/{w1}-{i}"
    elif style == 2:
        path = f"/{section}/{year}/{(r >> 32) % 12 + 1:02d}/{w1}-{i}.html"
    else:
        path = f"/{section}/ref/{w1}-{i}"
    return f"https://{cfg.host_name(h)}{path}"


def out_degree(i: int, cfg: WebConfig) -> int:
    u = _h(cfg.seed, 13, i) / MASK64
    return 2 + int(38 * u * u)  # skewed toward small degrees, max 40


def link_targets(i: int, cfg: WebConfig) -> list[int]:
    """Deterministic outlink target ids — never into the island."""
    targets: list[int] = []
    h = cfg.host_of(i)
    start, end = cfg.host_range(h)
    span = max(1, end - start)
    for k in range(out_degree(i, cfg)):
        r = _h(cfg.seed, 17, i, k)
        if (r % 100) < int(cfg.cross_host * 100) or span <= 1:
            j = r % cfg.n_reachable                    # anywhere reachable
        else:
            j = start + (r >> 16) % span               # same host
        if j != i:
            targets.append(j)
    return targets


def dirty_href(i: int, j: int, cfg: WebConfig) -> str:
    """Render the link i→j with a deterministic dirt variant that
    canonicalize_for_crawl must collapse back to canonical_url(j)."""
    canon = canonical_url(j, cfg)
    v = _h(cfg.seed, 19, i, j) % 8
    scheme_host, _, path = canon.partition("//")[2].partition("/")
    if v == 0:
        return canon
    if v == 1:  # same-host relative path
        if cfg.host_of(i) == cfg.host_of(j):
            return "/" + path
        return canon
    if v == 2:  # uppercase host
        return canon.replace(scheme_host, scheme_host.upper(), 1)
    if v == 3:  # fragment
        return canon + "#section-2"
    if v == 4:  # tracking params (dropped by the deep-crawl canonicalizer)
        return canon + "?utm_source=syn&utm_campaign=c1"
    if v == 5:  # trailing slash
        return canon + "/"
    if v == 6:  # two tracking params, both dropped by the canonicalizer
        return canon + "?utm_source=x&ref=feed"
    return canon


def status_of(i: int, cfg: WebConfig) -> tuple[int, str | None]:
    """(status_code, redirect_to).  Faults hit 1/fault_every pages."""
    r = _h(cfg.seed, 23, i)
    if r % cfg.fault_every == 1:
        kind = (r >> 8) % 4
        if kind == 0:
            return 404, None
        if kind == 1:
            return 429, None
        if kind == 2:
            return 503, None
        # 301 → a same-host reachable page
        start, end = cfg.host_range(cfg.host_of(i))
        j = start + (r >> 16) % max(1, end - start)
        if j == i:
            j = start
        return 301, canonical_url(j, cfg)
    return 200, None


_PARA_TMPL = (
    "The {w1} {w2} pipeline shuffles {n} {w3} partitions before the "
    "{w4} stage; every {w5} batch keeps its {w6} ordering stable so the "
    "{w7} operator can verify the {w8} invariant end to end."
)


def _paragraph(i: int, p: int, cfg: WebConfig) -> str:
    r = _h(cfg.seed, 29, i, p)
    w = [_WORDS[(r >> (4 * k)) % len(_WORDS)] for k in range(8)]
    return _PARA_TMPL.format(
        w1=w[0], w2=w[1], w3=w[2], w4=w[3], w5=w[4], w6=w[5], w7=w[6], w8=w[7],
        n=(r % 97) + 3,
    )


def page_html(i: int, cfg: WebConfig) -> str:
    """Deterministic HTML for page i: head metadata, headings,
    paragraphs, dirty links, images (src/data-src/srcset variants),
    occasional video/audio/table, nav/footer boilerplate."""
    r = _h(cfg.seed, 31, i)
    url = canonical_url(i, cfg)
    title = f"{_WORDS[r % len(_WORDS)]} {_WORDS[(r >> 5) % len(_WORDS)]} {i}"
    targets = link_targets(i, cfg)
    n_paras = (2 + (r >> 10) % 5) * cfg.richness
    n_imgs = ((r >> 16) % 4) * cfg.richness
    parts: list[str] = [
        "<!DOCTYPE html><html><head>",
        f"<title>{title}</title>",
        f'<meta name="description" content="Synthetic page {i} about {title}">',
        f'<meta name="keywords" content="{_WORDS[r % len(_WORDS)]},{_WORDS[(r >> 7) % len(_WORDS)]}">',
        f'<meta property="og:title" content="{title}">',
        "<script>window.__x = 1;</script>",
        "</head><body>",
        '<nav><a href="/">home</a></nav>',
        f"<h1>{title}</h1>",
    ]
    li = 0
    for p in range(n_paras):
        para = _paragraph(i, p, cfg)
        # weave 0-3 links into this paragraph
        n_links_here = min(len(targets) - li, (r >> (20 + p)) % 4)
        anchors = []
        for _ in range(n_links_here):
            j = targets[li]
            li += 1
            anchors.append(f'<a href="{dirty_href(i, j, cfg)}" title="t{j}">{_WORDS[j % len(_WORDS)]} {j}</a>')
        parts.append(f"<p>{para} {' '.join(anchors)}</p>")
        if p < n_imgs:
            v = _h(cfg.seed, 37, i, p) % 3
            src = f"/img/{_WORDS[(r >> p) % len(_WORDS)]}-{i}-{p}.png"
            if v == 0:
                parts.append(f'<img src="{src}" alt="figure {p}" width="640" height="480">')
            elif v == 1:
                parts.append(f'<img data-src="{src}" alt="lazy {p}">')
            else:
                parts.append(f'<img srcset="{src} 1x, /img/big-{i}-{p}.png 2x" alt="set {p}" width="320">')
    # remaining links in a related-list
    if li < len(targets):
        items = "".join(
            f'<li><a href="{dirty_href(i, j, cfg)}">{_WORDS[j % len(_WORDS)]} {j}</a></li>'
            for j in targets[li:]
        )
        parts.append(f"<h2>Related</h2><ul>{items}</ul>")
    if r % 5 == 0:
        parts.append(f'<video src="/media/clip-{i}.mp4"></video>')
    if r % 7 == 0:
        parts.append(f'<audio><source src="/media/pod-{i}.ogg"></audio>')
    if r % 4 == 0:
        parts.append(
            "<table><tr><th>key</th><th>value</th></tr>"
            f"<tr><td>id</td><td>{i}</td></tr>"
            f"<tr><td>host</td><td>{cfg.host_of(i)}</td></tr></table>"
        )
    parts.append(f'<blockquote>Quote for page {i}.</blockquote>')
    parts.append('<footer><a href="/about">about</a></footer>')
    parts.append("</body></html>")
    return "".join(parts)


def page_row(i: int, cfg: WebConfig) -> dict:
    status, redirect = status_of(i, cfg)
    return {
        "page_id": i,
        "url": canonical_url(i, cfg),
        "host": cfg.host_name(cfg.host_of(i)),
        "status_code": status,
        "redirect_to": redirect,
        "content_type": "text/html",
        "html": page_html(i, cfg) if status == 200 else "",
        "fetch_ms": 20 + _h(cfg.seed, 41, i) % 180,
    }


def synthetic_pages_pdf(cfg: WebConfig) -> pd.DataFrame:
    """Driver-side generation — simulator + small tests."""
    return pd.DataFrame([page_row(i, cfg) for i in range(cfg.n_pages)])


def synthetic_pages_df(spark, cfg: WebConfig, num_partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas.  Each task
    derives its own pages from ids alone — zero driver data movement,
    scales to any corpus size."""
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("page_id", LongType()),
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("status_code", IntegerType()),
        StructField("redirect_to", StringType()),
        StructField("content_type", StringType()),
        StructField("html", StringType()),
        StructField("fetch_ms", IntegerType()),
    ])

    n_parts = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame([page_row(int(i), cfg) for i in b["id"]])

    return spark.range(0, cfg.n_pages, numPartitions=n_parts).mapInPandas(gen, schema)


def seed_urls(cfg: WebConfig, n_seeds: int = 8) -> list[str]:
    """Deterministic seed list: first page of each host round-robin,
    hot host first (FIXTURES.md §1)."""
    seeds = []
    for k in range(n_seeds):
        h = k % cfg.n_hosts
        start, end = cfg.host_range(h)
        if start >= end:
            continue
        offset = (k // cfg.n_hosts) * 7
        i = start + (offset % max(1, end - start))
        u = canonical_url(i, cfg)
        if u not in seeds:
            seeds.append(u)
    return seeds


def robots_rows(cfg: WebConfig) -> list[dict]:
    """Per-host robots.txt (FIXTURES.md §3): host 0 disallows
    /private/, last host disallows everything, host 1 has a
    UA-specific section, the rest allow-by-default (empty rules)."""
    rows = []
    for h in range(cfg.n_hosts):
        host = cfg.host_name(h)
        if h == 0:
            rules = "User-agent: *\nDisallow: /private/\n"
        elif h == cfg.n_hosts - 1 and cfg.n_hosts > 2:
            rules = "User-agent: *\nDisallow: /\n"
        elif h == 1:
            rules = ("User-agent: evilbot\nDisallow: /\n\n"
                     "User-agent: *\nDisallow: /private/\nAllow: /private/open/\n")
        else:
            rules = ""
        rows.append({"host": host, "rules": rules, "fetch_time": 1_700_000_000})
    return rows
