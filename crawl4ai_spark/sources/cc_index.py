"""Common-Crawl index source (S2) + seeder result caches (S11) + KB
export/import (S12).

Clean-room re-expression of the reference's seeding sources
(behavioral spec: /root/reference/crawl4ai/async_url_seeder.py —
`_from_cc` :709-762: domain normalised by stripping scheme/query/
fragment/leading dots, CC glob `*.domain/*` (or `*.domain*` when the
domain string carries a path), results filtered by the caller's URL
pattern and cached as line files keyed by (index_id, domain,
md5(pattern)[:8]); seeder caches :340-360, KB export = crawl-result
JSON lines).

Spark shape: the CC index is just a table of (url, ...) rows — in
production `spark.read.parquet("s3://commoncrawl/cc-index/...")`
(the public columnar index), here any DataFrame with a `url` column.
Selection is two pushdown-friendly LIKE filters (host glob + caller
pattern) — at 100 TB the whole source is a partition-pruned scan, no
Python.  The cache is a parquet directory keyed the same way the
reference keys its .jsonl files; `load_or` is read-through."""

from __future__ import annotations

import hashlib
import os
import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.functions.filters import url_pattern_filter

__all__ = ["normalize_cc_domain", "cc_glob", "cc_index_seed", "SeederCache",
           "kb_export", "kb_import"]


def normalize_cc_domain(domain: str) -> str:
    """Strip scheme, fragment, query, leading dots
    (async_url_seeder.py:713-715)."""
    raw = re.sub(r"^https?://", "", domain or "")
    raw = raw.split("#", 1)[0].split("?", 1)[0].lstrip(".")
    return raw


def cc_glob(domain: str) -> str:
    """The CC index glob (async_url_seeder.py:730-731): keep an
    explicit path, else any path under any subdomain."""
    raw = normalize_cc_domain(domain)
    return f"*.{raw}*" if "/" in raw else f"*.{raw}/*"


def cc_index_seed(
    cc_index: DataFrame, domain: str, pattern: str = "*", url_col: str = "url",
) -> DataFrame:
    """Distinct URLs for `domain` matching `pattern`, in URL order.
    Both predicates compile to LIKE/regex Columns that push into the
    scan (the production path over the public CC columnar index)."""
    dom = normalize_cc_domain(domain)
    # the CC glob `*.domain/*` admits subdomains; also admit the bare
    # host itself (index rows are scheme-full URLs)
    host_re = r"^https?://([^/]*\.)?" + re.escape(dom.split("/")[0]) + "(/|$)"
    out = cc_index.select(F.col(url_col).alias("url")).filter(
        F.col("url").rlike(host_re)
    )
    if pattern and pattern != "*":
        out = out.filter(url_pattern_filter(F.col("url"), [pattern]))
    return out.distinct().orderBy("url")


class SeederCache:
    """Read-through parquet cache for seeder results, keyed like the
    reference's cache files: (source, domain, md5(pattern)[:8])
    (async_url_seeder.py:710-719)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, source: str, domain: str, pattern: str) -> str:
        digest = hashlib.md5((pattern or "*").encode()).hexdigest()[:8]
        safe = re.sub(r"[/?#]+", "_", normalize_cc_domain(domain))
        return os.path.join(self.root, f"{source}_{safe}_{digest}")

    def load_or(
        self, spark: SparkSession, source: str, domain: str, pattern: str,
        compute: Callable[[], DataFrame], force: bool = False,
    ) -> DataFrame:
        path = self._path(source, domain, pattern)
        if not force and os.path.exists(os.path.join(path, "_SUCCESS")):
            return spark.read.parquet(path)
        df = compute()
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)


def kb_export(docs: DataFrame, path: str) -> None:
    """KB export (S12): the docs table as JSON lines — the crawl-
    result interchange format."""
    docs.write.mode("overwrite").json(path)


def kb_import(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)
