"""PII scrubbing: detect and redact contact identifiers before a
corpus ships to training — emails, IPv4 addresses, and phone-shaped
numbers, each replaced by a typed placeholder token.

Patterns are deliberately engine-portable (ASCII classes, no
lookarounds) so the DuckDB oracle applies the byte-identical regexes;
replacement order is fixed (email → ip → phone) because the classes
can overlap on dotted digit runs.  Pure regexp_replace/regexp_count
column expressions: zero Python, composes into the same single
projection as the other text operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_counts", "redact_pii"]

# order matters: applied top to bottom
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_counts(text) -> Column:
    """struct<n_email, n_ip, n_phone> — counted in replacement order on
    the progressively-redacted text, so overlapping classes are never
    double-counted (an IP inside an email counts once, as email)."""
    t = _col(text)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(t, F.lit(pat)).alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, token)
    return F.struct(*counts)


def redact_pii(text) -> Column:
    """Text with every PII match replaced by its placeholder."""
    t = _col(text)
    for _name, pat, token in PII_PATTERNS:
        t = F.regexp_replace(t, pat, token)
    return t
