"""PII redaction for web-text corpora — pure codegen regexp chains.

Training-data pipelines scrub obvious personal identifiers before a
corpus ships (The Pile, FineWeb, and ROOTS all run exactly this class
of regex pass). These are the standard high-precision patterns — email
addresses, IPv4 addresses, international/US phone shapes — replaced
with stable placeholder tokens so downstream tokenization sees one
vocabulary item per category rather than millions of unique strings.

Kept deliberately RE2-safe (no backreferences, no lookaround) so the
DuckDB oracle runs the IDENTICAL patterns: redaction is part of the
byte contract, like the HTML extractor. Recall-heavier NER-style
scrubbing is a model call, out of scope for a codegen pass; these
patterns are the deterministic floor every pipeline runs first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) applied IN ORDER — email first so
# "user@host" never half-matches after the host is rewritten
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone_intl", r"\+[0-9]{7,15}\b", "<PHONE>"),
    ("phone_us", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Text with every pattern occurrence replaced by its placeholder."""
    out = text
    for _, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(text: Column) -> list[Column]:
    """One ``n_<name>`` count column per pattern (pre-redaction counts
    — computed on the raw text). Counts are computed the same way the
    redaction chain matches: each category counts AFTER the earlier
    categories have been redacted, so an email's host is never
    double-counted as an IP."""
    cols: list[Column] = []
    cur = text
    for name, pattern, repl in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pattern)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pattern, repl)
    return cols
