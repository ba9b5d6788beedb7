"""PII detection and redaction over document text.

Training corpora scrubbing (emails / phone numbers / IPv4 addresses /
SSN-shaped ids) as pure column expressions — ``regexp_count`` for detection
and chained ``regexp_replace`` for redaction, so the whole scrub is a
shuffle-free JVM map stage that composes with the curation funnel. At 100 TB
this runs at scan speed: no exchange, no Python, and the regexes are anchored
ASCII classes (cheap NFA, no catastrophic backtracking shapes).

Patterns are deliberately RE2-compatible (character classes, bounded repeats,
``\\b`` word boundaries only) so the DuckDB oracle evaluates the identical
pattern text — the same convention as the engine-neutral hashing in
``llmprep/text.py``.

Reference parity: the reference masks subscriber PII in its dbt staging layer
(see ``processing/silver/stg_customers`` MSISDN/email masking, SURVEY.md
§2.8 F13/F14); this module generalizes that to free-text scrubbing for the
LLM-pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: longer / more specific patterns first so redaction placeholders
# can't partially consume a later pattern's match (e.g. SSN before generic
# phone would both match d{3}-d{2}… shapes if patterns overlapped — these
# don't, but the fixed order keeps redaction deterministic regardless).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}

PII_PLACEHOLDERS: dict[str, str] = {
    "email": "[EMAIL]",
    "ipv4": "[IP]",
    "ssn": "[SSN]",
    "phone": "[PHONE]",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-type PII match counts (one ``regexp_count`` each, zero shuffle)."""
    c = F.col(text) if isinstance(text, str) else text
    return {name: F.regexp_count(c, F.lit(pat)) for name, pat in PII_PATTERNS.items()}


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its placeholder, in PII_PATTERNS order."""
    c = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, PII_PLACEHOLDERS[name])
    return c
