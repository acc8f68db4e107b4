"""PII detection / redaction for training-data pipelines.

Every serious pre-training corpus pass scrubs personally identifiable
information before tokenization (the C4 / RefinedWeb / FineWeb pipelines
all ship an email/IP/phone regex stage). This module is that stage,
Spark-first: pure JVM ``regexp_extract_all`` / ``regexp_replace`` column
expressions — no Python in the path, one corpus scan, zero shuffle,
linear at 100 TB.

Cross-engine portability (the DuckDB oracle hash-matches redacted text):
patterns use only RE2-safe constructs (character classes, bounded
quantifiers, ``\\b`` word boundaries — no lookaround, no backrefs), and
redaction applies the patterns in one fixed order in both engines.
DuckDB needs the ``'g'`` flag for replace-all; Spark's regexp_replace is
replace-all by default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: emails first (an email's domain can contain digit runs), then
# IPv4, then phone-ish digit runs (the loosest pattern last so it cannot
# shadow the structured ones).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d() -]{7,}\d", "<PHONE>"),
)


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII pattern in ``col`` (counted on the original
    text, before any redaction — order-independent and oracle-stable)."""
    pat = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))


def redact(col: Column) -> Column:
    """``col`` with every PII match replaced by its placeholder, patterns
    applied in the fixed ``PII_PATTERNS`` order."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_sql(expr: str) -> str:
    """DuckDB expression equivalent of :func:`redact` over ``expr``."""
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def count_sql(expr: str, kind: str) -> str:
    """DuckDB expression equivalent of :func:`pii_count` over ``expr``."""
    pat = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII report + scrubbed text: ``doc_id``, one count per
    pattern family, total, a ``pii_clean`` flag, and the redacted text.
    The pipeline stage form — downstream tokenization reads ``redacted``.

    Scale: pure column expressions over one scan; the redacted column is
    produced in the same projection, so no second pass over the corpus.
    """
    c = F.col(text_col)
    counts = [pii_count(c, k).alias(f"n_{k}") for k, _, _ in PII_PATTERNS]
    total = sum(F.col(f"n_{k}") for k, _, _ in PII_PATTERNS)
    return (docs
            .select("doc_id", c.alias("_text"), *counts)
            .select("doc_id",
                    *[f"n_{k}" for k, _, _ in PII_PATTERNS],
                    total.cast("long").alias("n_pii"),
                    F.when(total == 0, 1).otherwise(0).alias("pii_clean"),
                    redact(F.col("_text")).alias("redacted")))
