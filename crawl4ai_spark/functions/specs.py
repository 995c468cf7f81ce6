"""Declarative scorer/filter specs with two compilation targets.

A crawl config carries plain-data specs (JSON-able dicts).  Each spec
compiles to:

1. a native Catalyst Column (functions.scorers / functions.filters) —
   the engine's hot path, and
2. a pure-Python callable — used by the parity simulator
   (testing.simulator) so the oracle and the engine share one
   definition of scoring/filtering by construction.

The Python callables re-state the reference semantics directly
(scorers.py / filters.py of the reference — same file:line cites as
the Column compilers); the golden tests pin both backends to the
reference's expected values, and test_specs parity-checks the two
backends against each other on generated URLs.
"""

from __future__ import annotations

import fnmatch
import re
from typing import Any, Callable

from pyspark.sql import Column

from crawl4ai_spark.functions import filters as FL
from crawl4ai_spark.functions import scorers as SC

# ══════════════════════ scorers ══════════════════════════════════════

_DEPTH_LOOKUP = [1.0, 0.5, 1.0 / 3.0, 0.25]
_FRESHNESS_LOOKUP = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]
_YEAR_RE = re.compile(r"(?:/|[-_])((?:19|20)\d{2})")


def _py_path_depth(url: str) -> int:
    pos = url.find("/", url.find("://") + 3)
    if pos == -1:
        return 0
    path = url[pos:]
    if not path or path == "/":
        return 0
    return len([s for s in path.split("/") if s])


def _py_extension(url: str) -> str:
    pos = url.rfind(".")
    if pos == -1:
        return ""
    end = len(url)
    for i in range(pos + 1, len(url)):
        if not url[i].isalnum():
            end = i
            break
    return url[pos + 1 : end].lower()


def _py_domain(url: str) -> str:
    start = url.find("://")
    start = 0 if start == -1 else start + 3
    end = len(url)
    for i in range(start, len(url)):
        if url[i] in "/?#":
            end = i
            break
    domain = url[start:end]
    port = domain.rfind(":")
    if port != -1:
        domain = domain[:port]
    return domain.lower()


def compile_scorer_py(spec: dict[str, Any] | None) -> Callable[[str], float]:
    """Spec → pure-Python scorer (reference semantics)."""
    if spec is None:
        return lambda url: 0.0
    kind = spec["kind"]
    weight = float(spec.get("weight", 1.0))

    if kind == "keyword":
        case_sensitive = bool(spec.get("case_sensitive", False))
        kws = [k if case_sensitive else k.lower() for k in spec["keywords"]]

        def f(url: str) -> float:
            u = url if case_sensitive else url.lower()
            if not kws:
                return 0.0
            return (sum(1 for k in kws if k in u) / len(kws)) * weight

        return f

    if kind == "path_depth":
        optimal = int(spec.get("optimal_depth", 3))

        def f(url: str) -> float:
            dist = abs(_py_path_depth(url) - optimal)
            raw = _DEPTH_LOOKUP[dist] if dist < 4 else 1.0 / (1.0 + dist)
            return raw * weight

        return f

    if kind == "content_type":
        exact: dict[str, float] = {}
        regex: list[tuple[re.Pattern, float]] = []
        for pattern, score in spec["type_weights"].items():
            if pattern.startswith(".") and pattern.endswith("$"):
                exact[pattern[1:-1].lower()] = float(score)
            else:
                regex.append((re.compile(pattern), float(score)))
        regex.sort(key=lambda kv: -kv[1])

        def f(url: str) -> float:
            ext = _py_extension(url)
            if ext and ext in exact:
                return exact[ext] * weight
            for pat, score in regex:
                if pat.search(url):
                    return score * weight
            return 0.0

        return f

    if kind == "freshness":
        current_year = int(spec.get("current_year", 2024))

        def f(url: str) -> float:
            latest = None
            for m in _YEAR_RE.finditer(url):
                y = int(m.group(1))
                if y <= current_year and (latest is None or y > latest):
                    latest = y
            if latest is None:
                return 0.5 * weight
            diff = current_year - latest
            raw = _FRESHNESS_LOOKUP[diff] if diff < len(_FRESHNESS_LOOKUP) else max(0.1, 1.0 - diff * 0.1)
            return raw * weight

        return f

    if kind == "domain":
        weights = {d.lower(): float(s) for d, s in spec["domain_weights"].items()}
        default = float(spec.get("default_weight", 0.5))

        def f(url: str) -> float:
            return weights.get(_py_domain(url), default) * weight

        return f

    if kind == "composite":
        parts = [compile_scorer_py(s) for s in spec["scorers"]]
        normalize = bool(spec.get("normalize", True))

        def f(url: str) -> float:
            total = sum(p(url) for p in parts)
            return total / len(parts) if (normalize and parts) else total

        return f

    raise ValueError(f"unknown scorer kind: {kind}")


def compile_scorer_column(spec: dict[str, Any] | None, url_col) -> Column:
    """Spec → native Column (same semantics, JVM-side)."""
    from pyspark.sql import functions as F

    if spec is None:
        return F.lit(0.0)
    kind = spec["kind"]
    weight = float(spec.get("weight", 1.0))
    if kind == "keyword":
        return SC.keyword_relevance_score(
            url_col, spec["keywords"], weight=weight,
            case_sensitive=bool(spec.get("case_sensitive", False)),
        )
    if kind == "path_depth":
        return SC.path_depth_score(url_col, optimal_depth=int(spec.get("optimal_depth", 3)), weight=weight)
    if kind == "content_type":
        return SC.content_type_score(url_col, spec["type_weights"], weight=weight)
    if kind == "freshness":
        return SC.freshness_score(url_col, current_year=int(spec.get("current_year", 2024)), weight=weight)
    if kind == "domain":
        return SC.domain_authority_score(
            url_col, spec["domain_weights"],
            default_weight=float(spec.get("default_weight", 0.5)), weight=weight,
        )
    if kind == "composite":
        parts = [compile_scorer_column(s, url_col) for s in spec["scorers"]]
        return SC.composite_score(parts, normalize=bool(spec.get("normalize", True)))
    raise ValueError(f"unknown scorer kind: {kind}")


# ══════════════════════ filters ══════════════════════════════════════

def compile_filter_py(spec: dict[str, Any]) -> Callable[[str], bool]:
    kind = spec["kind"]

    if kind == "pattern":
        patterns = spec["patterns"]
        if isinstance(patterns, str):
            patterns = [patterns]
        reverse = bool(spec.get("reverse", False))
        suffixes: set[str] = set()
        prefixes: list[str] = []
        regexes: list[re.Pattern] = []
        for p in patterns:
            if p.startswith("^") or p.endswith("$") or "\\d" in p:
                regexes.append(re.compile(p))
            elif p.count("*") == 1 and p.startswith("*."):
                suffixes.add(p[2:])
            elif p.count("*") == 1 and p.endswith("/*"):
                prefixes.append(p[:-2])
            else:
                if "**" in p:
                    p = p.replace("**", ".*")
                if "{" in p:
                    p = re.sub(r"\{([^}]+)\}", lambda m: f'({"|".join(m.group(1).split(","))})', p)
                regexes.append(re.compile(fnmatch.translate(p)))

        def f(url: str) -> bool:
            result = False
            no_query = url.split("?")[0]
            if suffixes and no_query.split("/")[-1].split(".")[-1] in suffixes:
                result = True
            if not result:
                for prefix in prefixes:
                    if no_query.startswith(prefix) and (
                        len(no_query) == len(prefix) or no_query[len(prefix)] in "/?#"
                    ):
                        result = True
                        break
            if not result:
                result = any(r.search(url) for r in regexes)
            return (not result) if reverse else result

        return f

    if kind == "domain":
        allowed = spec.get("allowed_domains")
        blocked = spec.get("blocked_domains")
        if isinstance(allowed, str):
            allowed = [allowed]
        if isinstance(blocked, str):
            blocked = [blocked]
        allowed = [d.lower() for d in allowed] if allowed else None
        blocked = [d.lower() for d in blocked] if blocked else []
        dom_re = re.compile(r"://([^/]+)")

        def f(url: str) -> bool:
            if not blocked and allowed is None:
                return True
            m = dom_re.search(url)
            dom = m.group(1).lower() if m else ""
            for b in blocked:
                if dom == b or dom.endswith("." + b):
                    return False
            if allowed is None:
                return True
            return any(dom == a or dom.endswith("." + a) for a in allowed)

        return f

    if kind == "content_type":
        allowed_types = spec["allowed_types"]
        if isinstance(allowed_types, str):
            allowed_types = [allowed_types]
        allowed = {t.lower() for t in allowed_types}
        exts = {e for e, mime in FL.CONTENT_EXT_MIME.items() if any(a in mime for a in allowed)}

        def f(url: str) -> bool:
            u = url.split("://", 1)[-1]
            slash = u.find("/")
            path = u[slash:] if slash != -1 else ""
            filename = path.rsplit("/", 1)[-1] if "/" in path else ""
            if "." not in filename:
                return True
            return filename.rpartition(".")[-1].lower() in exts

        return f

    if kind == "nonsense":
        from urllib.parse import urlparse

        utility = FL._UTILITY_FILES
        non_content = FL._NON_CONTENT_PATHS
        short_ok = set(FL._SHORT_PATH_WHITELIST)

        def f(url: str) -> bool:
            low = url.lower()
            path = urlparse(url).path.lower()
            if path.endswith(("/robots.txt", "/sitemap.xml", "/sitemap_index.xml")):
                return False
            if "/sitemap" in path and path.endswith((".xml", ".xml.gz", ".txt")):
                return False
            if any(path.endswith(f"/{x}") for x in utility):
                return False
            if any(part.startswith(".") for part in path.split("/") if part):
                return False
            if any(ncp in path for ncp in non_content):
                return False
            if any(p in low for p in ("?print=", "&print=", "/print/", "_print.")):
                return False
            if len(path.strip("/")) < 3 and path not in short_ok:
                return False
            return True

        return f

    raise ValueError(f"unknown filter kind: {kind}")


def compile_filter_column(spec: dict[str, Any], url_col) -> Column:
    kind = spec["kind"]
    if kind == "pattern":
        return FL.url_pattern_filter(url_col, spec["patterns"], reverse=bool(spec.get("reverse", False)))
    if kind == "domain":
        return FL.domain_filter(
            url_col,
            allowed_domains=spec.get("allowed_domains"),
            blocked_domains=spec.get("blocked_domains"),
        )
    if kind == "content_type":
        return FL.content_type_filter(url_col, spec["allowed_types"])
    if kind == "nonsense":
        return FL.nonsense_url_filter(url_col)
    raise ValueError(f"unknown filter kind: {kind}")


def compile_filters_py(specs: list[dict[str, Any]]) -> Callable[[str], bool]:
    fns = [compile_filter_py(s) for s in specs]
    return lambda url: all(f(url) for f in fns)


def compile_filters_column(specs: list[dict[str, Any]], url_col) -> Column:
    return FL.filter_chain(*[compile_filter_column(s, url_col) for s in specs])
