"""PII detection and redaction (training-data scrubbing pass).

Flags and masks the high-frequency machine-recognizable identifier
classes — emails, IPv4 addresses, phone-shaped digit runs — the way a
corpus pre-release scrub does. Everything is JVM-side ``regexp_*``
column algebra: per-row, zero shuffle, scan-speed at 100 TB.

Patterns deliberately use only the regex subset Java (Spark) and RE2
(DuckDB) interpret identically — no lookaround, no backreferences —
so the operator is oracle-checkable (tests/test_pii.py runs the same
patterns in DuckDB, including the ``'g'`` flag DuckDB needs to match
Spark's replace-all semantics).

Redaction replaces matches with typed mask tokens in a fixed pass
order (email → IPv4 → phone). Ordering matters: earlier passes must
not create text later patterns could match, and mask tokens contain no
digits or ``@`` so they are fixed points of every pass. Detection
counts are computed on the ORIGINAL text, independent of redaction.

This targets pattern-shaped PII only; named-entity PII (people,
addresses) needs a model pass and is out of scope for a regex scrub.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d()\- ]{6,}\d"

#: (column-suffix, pattern, mask) in redaction pass order.
PII_CLASSES: tuple[tuple[str, str, str], ...] = (
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ips", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
)


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def redact_expr(col: str = "text") -> Column:
    """The redacted text as a single chained column expression."""
    out: Column = F.col(col)
    for _, pattern, mask in PII_CLASSES:
        out = F.regexp_replace(out, pattern, mask)
    return out


def pii_scrub(docs: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, redacted) per document."""
    from ..plans.partitioning import spread

    counts = [
        _count(F.col(col), pattern).alias(f"n_{name}")
        for name, pattern, _ in PII_CLASSES
    ]
    return spread(docs).select(
        "doc_id", *counts, redact_expr(col).alias("redacted")
    )
