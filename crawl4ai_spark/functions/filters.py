"""URL filters as native Catalyst Column predicates.

Clean-room re-expressions of the reference filter chain (behavioral
spec: /root/reference/crawl4ai/deep_crawling/filters.py —
URLPatternFilter :119-255, ContentTypeFilter :258-421, DomainFilter
:424-498; nonsense-URL filter: async_url_seeder.py:1284-1378; URL
well-formedness gate: bfs_strategy.py:46-66).

Each compiler runs once at plan-build time (Python), categorizing the
patterns into the cheapest Spark expression — endswith / startswith /
isin / rlike — exactly the way the reference categorizes patterns
into SUFFIX/PREFIX/DOMAIN/PATH matchers, then the per-row work is all
JVM-side.  A FilterChain is just `&` over the compiled predicates;
Catalyst folds and short-circuits them (filters.py:69-116's manual
short-circuit is what the optimizer does for free on columns).
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "url_pattern_filter",
    "content_type_filter",
    "domain_filter",
    "nonsense_url_filter",
    "valid_crawl_url",
    "filter_chain",
    "CONTENT_EXT_MIME",
]


def _col(url) -> Column:
    return F.col(url) if isinstance(url, str) else url


# ── URLPatternFilter ──────────────────────────────────────────────────

def _glob_to_java_regex(pattern: str) -> str:
    """Glob → Java-compatible regex via fnmatch.translate, with the
    reference's pre-transforms for ** and {a,b} (filters.py:193-204)."""
    if "**" in pattern:
        pattern = pattern.replace("**", ".*")
    if "{" in pattern:
        pattern = re.sub(r"\{([^}]+)\}", lambda m: f'({"|".join(m.group(1).split(","))})', pattern)
    translated = fnmatch.translate(pattern)
    # fnmatch.translate emits `(?s:...)\Z` — both constructs are valid
    # in Java regex, and rlike's find() + the \Z anchor reproduces
    # Python re.search on the fullmatch-shaped pattern.
    return translated


def url_pattern_filter(url, patterns, *, reverse: bool = False) -> Column:
    """Glob/regex URL pattern predicate (URLPatternFilter semantics).

    Categories (filters.py:157-175):
      SUFFIX  `*.html`  → last path segment's extension ∈ set
      PREFIX  `/foo/*`  → startswith + path-boundary check
      REGEX   `^...`/`...$`/contains `\\d` → used verbatim
      PATH    everything else → glob-translated regex, search semantics
    """
    if isinstance(patterns, str):
        patterns = [patterns]
    u = _col(url)
    no_query = F.split(u, r"\?", 2)[0]

    suffixes: list[str] = []
    prefixes: list[str] = []
    regexes: list[str] = []
    for p in patterns:
        if p.startswith("^") or p.endswith("$") or "\\d" in p:
            regexes.append(p)
        elif p.count("*") == 1 and p.startswith("*."):
            suffixes.append(p[2:])
        elif p.count("*") == 1 and p.endswith("/*"):
            prefixes.append(p[:-2])
        else:
            regexes.append(_glob_to_java_regex(p))

    preds: list[Column] = []
    if suffixes:
        last_seg = F.element_at(F.split(no_query, "/"), -1)
        ext = F.element_at(F.split(last_seg, r"\."), -1)
        preds.append(ext.isin(suffixes))
    for p in prefixes:
        # Boundary: the char after the prefix must be /, ?, # or end
        # (filters.py:239-244).
        quoted = re.escape(p)
        preds.append(no_query.rlike(f"^{quoted}([/?#]|$)"))
    for r in regexes:
        preds.append(u.rlike(r))

    out = preds[0] if preds else F.lit(False)
    for p in preds[1:]:
        out = out | p
    return ~out if reverse else out


# ── ContentTypeFilter ─────────────────────────────────────────────────

# Extension → MIME map (the reference's _MIME_MAP table,
# filters.py:264-360 — standard IANA/extension facts).
CONTENT_EXT_MIME: dict[str, str] = {
    "txt": "text/plain", "html": "text/html", "htm": "text/html",
    "xhtml": "application/xhtml+xml", "css": "text/css", "csv": "text/csv",
    "ics": "text/calendar", "js": "application/javascript",
    "bmp": "image/bmp", "gif": "image/gif", "jpeg": "image/jpeg",
    "jpg": "image/jpeg", "png": "image/png", "svg": "image/svg+xml",
    "tiff": "image/tiff", "ico": "image/x-icon", "webp": "image/webp",
    "mp3": "audio/mpeg", "wav": "audio/wav", "ogg": "audio/ogg",
    "m4a": "audio/mp4", "aac": "audio/aac", "midi": "audio/midi", "mid": "audio/midi",
    "mp4": "video/mp4", "mpeg": "video/mpeg", "webm": "video/webm",
    "avi": "video/x-msvideo", "mov": "video/quicktime", "flv": "video/x-flv",
    "wmv": "video/x-ms-wmv", "mkv": "video/x-matroska",
    "json": "application/json", "xml": "application/xml", "pdf": "application/pdf",
    "zip": "application/zip", "gz": "application/gzip", "tar": "application/x-tar",
    "rar": "application/vnd.rar", "7z": "application/x-7z-compressed",
    "exe": "application/vnd.microsoft.portable-executable",
    "msi": "application/x-msdownload",
    "woff": "font/woff", "woff2": "font/woff2", "ttf": "font/ttf", "otf": "font/otf",
    "doc": "application/msword", "dot": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "xls": "application/vnd.ms-excel", "ppt": "application/vnd.ms-powerpoint",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "tgz": "application/gzip", "bz2": "application/x-bzip2",
    "rtf": "application/rtf", "apk": "application/vnd.android.package-archive",
    "epub": "application/epub+zip", "jar": "application/java-archive",
    "swf": "application/x-shockwave-flash", "ps": "application/postscript",
    "ai": "application/postscript", "eps": "application/postscript",
    "bin": "application/octet-stream", "dmg": "application/x-apple-diskimage",
    "iso": "application/x-iso9660-image", "deb": "application/x-debian-package",
    "rpm": "application/x-rpm", "sqlite": "application/vnd.sqlite3",
    "unknown": "application/octet-stream",
    "php": "application/x-httpd-php", "php3": "application/x-httpd-php",
    "php4": "application/x-httpd-php", "php5": "application/x-httpd-php",
    "php7": "application/x-httpd-php", "phtml": "application/x-httpd-php",
    "phps": "application/x-httpd-php-source",
}


def path_filename_extension(url) -> Column:
    """Extension of the last path segment; '' when the filename has no
    dot (ContentTypeFilter._extract_extension, filters.py:362-381):
    scheme and authority are stripped first so host dots don't count."""
    u = _col(url)
    after_scheme = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    slash = F.instr(after_scheme, "/")
    path = F.when(slash > 0, F.substring_index(after_scheme, "/", -1)).otherwise(F.lit(""))
    # Reference: filename = last '/'-segment IF the path contains '/';
    # after substring_index the filename may still contain ? or # parts —
    # the reference keeps them (it splits only on '/'), so we do too.
    return F.when(path.contains("."), F.lower(F.element_at(F.split(path, r"\."), -1)))\
            .otherwise(F.lit(""))


def content_type_filter(url, allowed_types, *, check_extension: bool = True) -> Column:
    """MIME allowlist on the URL's filename extension; extensionless
    URLs always pass (filters.py:383-421)."""
    if not check_extension:
        return F.lit(True)
    if isinstance(allowed_types, str):
        allowed_types = [allowed_types]
    allowed = {t.lower() for t in allowed_types}
    allowed_exts = [ext for ext, mime in CONTENT_EXT_MIME.items() if any(a in mime for a in allowed)]
    ext = path_filename_extension(url)
    return (ext == "") | ext.isin(allowed_exts)


# ── DomainFilter ──────────────────────────────────────────────────────

def _domain_of(url) -> Column:
    """Authority extracted with the reference's `://([^/]+)` regex —
    no scheme → '' (filters.py:429-468; port NOT stripped)."""
    return F.lower(F.regexp_extract(_col(url), r"://([^/]+)", 1))


def domain_filter(url, *, allowed_domains=None, blocked_domains=None) -> Column:
    """Allow/block lists with subdomain matching: domain == d or
    domain endswith '.'+d (filters.py:458-498)."""
    if isinstance(allowed_domains, str):
        allowed_domains = [allowed_domains]
    if isinstance(blocked_domains, str):
        blocked_domains = [blocked_domains]
    if not allowed_domains and not blocked_domains:
        return F.lit(True)
    dom = _domain_of(url)

    def matches(domains: list[str]) -> Column:
        out = F.lit(False)
        for d in domains:
            d = d.lower()
            out = out | (dom == d) | dom.endswith("." + d)
        return out

    pred = F.lit(True)
    if blocked_domains:
        pred = pred & ~matches(blocked_domains)
    if allowed_domains:
        pred = pred & matches(allowed_domains)
    return pred


# ── Nonsense/utility URL filter (seeder) ──────────────────────────────

_UTILITY_FILES = [
    "ads.txt", "humans.txt", "security.txt", ".well-known/security.txt",
    "crossdomain.xml", "browserconfig.xml", "manifest.json",
    "apple-app-site-association", ".well-known/apple-app-site-association",
    "favicon.ico", "apple-touch-icon.png", "android-chrome-192x192.png",
]
_NON_CONTENT_PATHS = [
    "/wp-admin", "/wp-includes", "/wp-content/uploads",
    "/admin", "/login", "/signin", "/signup", "/register",
    "/checkout", "/cart", "/account", "/profile",
    "/search", "/404", "/error", "/.git", "/.svn", "/.hg",
    "/cgi-bin", "/scripts", "/includes",
]
_SHORT_PATH_WHITELIST = ["/", "/en", "/de", "/fr", "/es", "/it"]


def nonsense_url_filter(url) -> Column:
    """True for URLs worth crawling; False for robots/sitemaps/utility
    files, dotfile paths, auth/cart/admin paths, print views, and
    too-short paths (async_url_seeder.py:1284-1378 — active rules only;
    the reference keeps rules 4-8 commented out and so do we)."""
    u = _col(url)
    low = F.lower(u)
    path = F.lower(F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""))

    bad = path.rlike(r"/(robots\.txt|sitemap\.xml|sitemap_index\.xml)$")
    bad = bad | (path.contains("/sitemap") & path.rlike(r"\.(xml|xml\.gz|txt)$"))
    utility_alt = "|".join(re.escape(f) for f in _UTILITY_FILES)
    bad = bad | path.rlike(f"/({utility_alt})$")
    bad = bad | path.rlike(r"/\.")  # hidden files/dirs anywhere in the path
    for ncp in _NON_CONTENT_PATHS:
        bad = bad | path.contains(ncp)
    bad = bad | low.rlike(r"(\?print=|&print=|/print/|_print\.)")
    stripped = F.regexp_replace(path, r"^/+|/+$", "")
    bad = bad | ((F.length(stripped) < 3) & ~path.isin(_SHORT_PATH_WHITELIST))
    return ~bad


# ── Well-formedness gate + chain ──────────────────────────────────────

def valid_crawl_url(url) -> Column:
    """http(s) scheme, netloc present and dotted
    (bfs_strategy.py:46-66)."""
    return _col(url).rlike(r"^https?://[^/?#]*\.[^/?#]*")


def filter_chain(*predicates: Column) -> Column:
    """Conjunction of compiled filter predicates — the FilterChain
    (filters.py:69-116).  Catalyst short-circuits and reorders the
    cheap native predicates; keep any UDF-backed predicate last."""
    out = F.lit(True)
    for p in predicates:
        out = out & p
    return out
