"""URL-relevance fallback scorer (R10) — query-vs-URL string-match
relevance used by the seeder when no head content is available.

Clean-room re-expression of
/root/reference/crawl4ai/async_url_seeder.py:1196-1282
(`_calculate_url_relevance_score`): the URL splits into domain dots,
path segments and query k/v parts; three evidence families score it —
exact substring containment (1.0 / 0.9), per-token coverage
(0.7·|token|/|part| or 0.6·|part|/|token|), and 3-gram Jaccard
(×0.5) — then a 1/(i+1)-weighted average of the sorted scores, capped
at 1.0.

The loops are data-dependent (parts × tokens), so this is an Arrow
UDF (batch-vectorized), not a Column expression — it runs in the
seeding pipeline, not the crawl hot loop."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType

__all__ = ["url_relevance_score_py", "make_url_relevance_udf"]


def _ngrams(text: str, n: int = 3) -> set[str]:
    return {text[i:i + n] for i in range(len(text) - n + 1)}


def url_relevance_score_py(query: str, url: str) -> float:
    from urllib.parse import urlparse

    query_lower = (query or "").lower()
    parsed = urlparse(url or "")
    domain = parsed.netloc.replace("www.", "")
    path = parsed.path.strip("/")
    parts = domain.split(".") + [p for p in path.split("/") if p]
    if parsed.query:
        for param in parsed.query.split("&"):
            if "=" in param:
                k, v = param.split("=", 1)
                parts.extend([k, v])

    scores: list[float] = []
    query_tokens = query_lower.split()
    for part in parts:
        pl = part.lower()
        if query_lower and query_lower in pl:
            scores.append(1.0)
        elif pl and pl in query_lower:
            scores.append(0.9)
    for token in query_tokens:
        token_scores = []
        for part in parts:
            pl = part.lower()
            if not pl:
                continue
            if token in pl:
                token_scores.append(0.7 * len(token) / len(pl))
            elif pl in token:
                token_scores.append(0.6 * len(pl) / len(token))
        if token_scores:
            scores.append(max(token_scores))
    url_text = " ".join(parts).lower()
    if len(query_lower) >= 3 and len(url_text) >= 3:
        qn, un = _ngrams(query_lower), _ngrams(url_text)
        if qn and un:
            union = len(qn | un)
            scores.append(0.5 * (len(qn & un) / union if union else 0.0))

    if not scores:
        return 0.0
    scores.sort(reverse=True)
    weighted = sum(s / (i + 1) for i, s in enumerate(scores))
    total_w = sum(1 / (i + 1) for i in range(len(scores)))
    return min(weighted / total_w if total_w else 0.0, 1.0)


def make_url_relevance_udf(query: str):
    @pandas_udf(DoubleType())
    def udf(url: pd.Series) -> pd.Series:
        return pd.Series([url_relevance_score_py(query, u) for u in url])

    return udf
