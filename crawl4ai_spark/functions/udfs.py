"""Vectorized pandas UDFs for the scalar URL functions.

Per BASELINE.json input_hint: *no per-row Python UDFs* — every Python
scalar goes through Arrow-batched pandas UDFs.  The hash used for the
seen set is Spark's native ``xxhash64`` (JVM-side, zero Python cost);
only functions that genuinely need urllib land here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import BooleanType, IntegerType, StringType

from crawl4ai_spark.functions import urlnorm


@pandas_udf(StringType())
def canonicalize_udf(href: pd.Series, base_url: pd.Series) -> pd.Series:
    """Deep-crawl canonical URL (seen-set identity).  C1/C2 in SURVEY §2.3."""
    return pd.Series(
        [urlnorm.canonicalize_for_crawl(h, b) for h, b in zip(href, base_url)],
        dtype=object,
    )


@pandas_udf(StringType())
def normalize_full_udf(href: pd.Series, base_url: pd.Series) -> pd.Series:
    """Full normalizer (link-dedup/cache identity, utils.py:2142 semantics)."""
    return pd.Series(
        [urlnorm.normalize_url(h, b) for h, b in zip(href, base_url)],
        dtype=object,
    )


@pandas_udf(StringType())
def host_udf(url: pd.Series) -> pd.Series:
    """Politeness partition key (lowercased netloc)."""
    return url.map(urlnorm.get_host, na_action="ignore")


@pandas_udf(StringType())
def base_domain_udf(url: pd.Series) -> pd.Series:
    """Registrable base domain (internal/external split key)."""
    return url.map(urlnorm.get_base_domain, na_action="ignore")


@pandas_udf(BooleanType())
def is_valid_url_udf(url: pd.Series) -> pd.Series:
    """http(s) + dotted-netloc well-formedness gate (F1)."""
    return pd.Series(
        [urlnorm.is_valid_crawl_url(u) if isinstance(u, str) else False for u in url],
        dtype=bool,
    )


@pandas_udf(IntegerType())
def url_depth_udf(url: pd.Series) -> pd.Series:
    """Path-segment depth (PathDepthScorer support)."""
    return url.map(urlnorm.url_depth, na_action="ignore").astype("Int32")


def url_hash(col: Column | str) -> Column:
    """Native 64-bit hash of the canonical URL — the only thing that
    shuffles at 10^10 scale.  JVM-side xxhash64, no Python."""
    return F.xxhash64(F.col(col) if isinstance(col, str) else col)
