"""PII scrubbing for text columns — the redaction pass a training-data
pipeline runs before tokenization.

Built entirely from JVM-side ``regexp_replace`` / ``regexp_count`` (no
Python UDF): whole-stage-codegen keeps the scrub in the scan stage, so at
100 TB it adds zero shuffles and no Arrow transfer. Patterns are ordered
(email before phone) so an address like ``a.b@c.de`` is consumed by the
email rule before the digit rule can split it.

The synthetic ``documents`` corpus contains no PII (verified: zero digit
characters), so this surface is pinned by fixture tests
(``tests/test_functions_text.py``) rather than a vacuous gate query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered (name, regex, replacement-token). Java regex; kept to constructs
# RE2/DuckDB also accept so the same patterns can back an oracle if a
# PII-bearing corpus is ever gated.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # ipv4 before phone: dotted quads are digit-runs the (dot-accepting)
    # phone rule would otherwise consume.
    ("ipv4", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its token, applying patterns in
    declaration order (earlier rules consume text before later ones)."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category match counts for the *original* column — audit
    columns to aggregate alongside the redacted text. Counts are taken
    on a progressively-redacted copy so categories don't double-count
    the same span (mirrors ``redact_pii``'s ordering)."""
    counts: dict[str, Column] = {}
    staged = col
    for name, pattern, token in PII_PATTERNS:
        counts[f"n_{name}"] = F.regexp_count(staged, F.lit(pattern)).cast("long")
        staged = F.regexp_replace(staged, pattern, token)
    return counts
