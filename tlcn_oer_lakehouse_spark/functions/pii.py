"""PII detection / redaction as pure column expressions.

A training-data pipeline must strip personally identifiable information
before a corpus ships (the reference stores raw author emails and names in
its OAI-PMH metadata — e.g. transformer.py's dc.contributor handling — but
never scrubs free text; this is the scale-side completion of that gap).

Patterns are deliberately restricted to syntax that behaves identically in
Java regex (Spark, JVM-side codegen) and RE2 (DuckDB oracle): character
classes, bounded repetition, ``\\b`` word boundaries — no lookarounds, no
backreferences.  Detection counts are computed on the ORIGINAL text per
pattern (independent, order-free); redaction applies the patterns in the
fixed ``PII_PATTERNS`` order on both engines, so overlapping matches (an
IPv4 that also parses as a phone number) resolve identically.

Scale: pure ``regexp_extract_all`` / ``regexp_replace`` compositions —
map-only, whole-stage-codegen'd, no shuffle; runs at scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (kind, pattern, replacement) — order is the redaction order.
# Email first (its local part could swallow digits of later patterns),
# then card before phone (both are digit runs with separators).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CARD]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-kind match counts over the original text (``n_<kind>``)."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(c: Column) -> Column:
    """Replace every PII span with its typed placeholder, applying the
    patterns in ``PII_PATTERNS`` order (sequential rewrite, so a span
    consumed by an earlier pattern is invisible to later ones)."""
    out = c
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
