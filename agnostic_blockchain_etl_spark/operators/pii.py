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


# ---------------------------------------------------------------------------
# Credit cards: regex candidates + Luhn validation (regex alone
# false-positives on every 13-19 digit run — order ids, hashes, phone
# numbers; the checksum is what makes the signal usable). Kept OUT of
# PII_PATTERNS so the base scrub (and the gate oracles derived from it)
# is untouched; `pii_scrub_extended` adds the column.
# ---------------------------------------------------------------------------

# contiguous runs and 4-4-4-4 grouped forms (space or dash)
CCN_PATTERNS: tuple[str, ...] = (
    r"\b\d{13,19}\b",
    r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b",
)


def luhn_valid(col: Column) -> Column:
    """Luhn checksum over a digit-only string column — pure JVM HOF
    arithmetic, portable to DuckDB (see :func:`luhn_sql`): reverse the
    digits, double every second one, subtract 9 when the double exceeds
    9, valid iff the sum is ≡ 0 (mod 10)."""
    rev = F.reverse(col)
    terms = F.transform(
        F.sequence(F.lit(1), F.length(rev)),
        lambda i: F.when(
            i % 2 == 1, F.substr(rev, i, F.lit(1)).cast("int")
        ).otherwise(
            F.when(F.substr(rev, i, F.lit(1)).cast("int") * 2 > 9,
                   F.substr(rev, i, F.lit(1)).cast("int") * 2 - 9)
            .otherwise(F.substr(rev, i, F.lit(1)).cast("int") * 2)))
    return F.aggregate(terms, F.lit(0),
                       lambda a, x: a + x) % 10 == 0


def luhn_sql(expr: str) -> str:
    """DuckDB twin of :func:`luhn_valid` over a digit-string expr."""
    rev = f"reverse({expr})"
    d = f"CAST(substr({rev}, i, 1) AS INT)"
    return (f"list_sum(list_transform(generate_series(1, len({rev})), "
            f"i -> CASE WHEN i % 2 = 1 THEN {d} "
            f"WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)) "
            f"% 10 = 0")


def ccn_count(col: Column) -> Column:
    """Number of Luhn-VALID card-number candidates in ``col``."""
    cands = F.concat(*[F.regexp_extract_all(col, F.lit(p), F.lit(0))
                       for p in CCN_PATTERNS])
    digits = F.transform(cands,
                         lambda s: F.regexp_replace(s, r"[ -]", ""))
    return F.size(F.filter(digits, luhn_valid))


def ccn_count_sql(expr: str) -> str:
    """DuckDB twin of :func:`ccn_count`."""
    cands = " || ".join(f"regexp_extract_all({expr}, '{p}')"
                        for p in CCN_PATTERNS)
    return (f"len(list_filter(list_transform({cands}, "
            f"s -> regexp_replace(s, '[ -]', '', 'g')), "
            f"s -> {luhn_sql('s')}))")


def pii_scrub_extended(docs: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """:func:`pii_scrub` plus card numbers: adds ``n_ccn`` (Luhn-valid
    candidates) and, for documents carrying at least one valid card,
    redacts every card-shaped run to ``<CCN>`` BEFORE the base patterns
    (a card run would otherwise be swallowed by the loose phone
    pattern). The doc-level decision — redact all card-shaped runs in a
    document with ≥1 validated card — is deliberately conservative:
    per-match conditional replacement is not expressible with
    regexp_replace, and a doc that leaks one card gets its whole digit
    neighborhood cleaned.

    The base-family counts are computed over the CARD-REDACTED text (not
    the original): a card run also matched by the loose phone pattern
    would otherwise be counted in both ``n_phone`` and ``n_ccn`` —
    double-counting ``n_pii`` and disagreeing with the redacted output,
    where that run became ``<CCN>``. Counting over ``pre`` attributes
    each run to exactly one family, matching the redaction."""
    c = F.col(text_col)
    n_ccn = ccn_count(c)
    ccn_redacted = c
    for p in CCN_PATTERNS:
        ccn_redacted = F.regexp_replace(ccn_redacted, p, "<CCN>")
    pre = F.when(n_ccn > 0, ccn_redacted).otherwise(c)
    counts = [pii_count(pre, k).alias(f"n_{k}") for k, _, _ in PII_PATTERNS]
    total = sum(F.col(f"n_{k}") for k, _, _ in PII_PATTERNS) \
        + F.col("n_ccn")
    return (docs
            .select("doc_id", pre.alias("_text"), *counts,
                    n_ccn.alias("n_ccn"))
            .select("doc_id",
                    *[f"n_{k}" for k, _, _ in PII_PATTERNS], "n_ccn",
                    total.cast("long").alias("n_pii"),
                    F.when(total == 0, 1).otherwise(0).alias("pii_clean"),
                    redact(F.col("_text")).alias("redacted")))
