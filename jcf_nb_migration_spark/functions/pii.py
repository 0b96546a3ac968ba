"""PII detection and masking for training-data curation.

Scrubbing emails / IP addresses / phone numbers out of a corpus before
training is a standard curation step. Everything here is a chain of
JVM-side ``regexp_replace`` / ``regexp_count`` expressions — whole-stage
codegen'd, zero Python in the hot path — so masking runs at parquet scan
bandwidth on a 100 TB documents table (the same "stay JVM-side" rule as
functions/text.py).

Pattern portability: every pattern uses only the regex subset Java
(Spark) and RE2 (DuckDB) evaluate identically — character classes,
bounded repetition, ``\\b`` word boundaries; no lookaround, no
backreferences — so a DuckDB oracle replays the masking byte-for-byte
(the same constraint BPE_ISH_PATTERN in functions/text.py satisfies).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: emails first (their host part would otherwise be nibbled by
# later patterns), then phones, then bare IPs. Each (name, pattern,
# replacement) masks ALL non-overlapping occurrences left-to-right —
# Java replaceAll and RE2 'g' agree on that scan order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_counts(c: Column | str) -> dict[str, Column]:
    """Per-kind occurrence counts on the RAW text (counted before any
    masking so kinds don't steal each other's matches)."""
    col = F.col(c) if isinstance(c, str) else c
    return {name: F.regexp_count(col, F.lit(pat))
            for name, pat, _ in PII_PATTERNS}


def pii_scrub(c: Column | str) -> Column:
    """Mask every PII pattern, in PII_PATTERNS order."""
    col = F.col(c) if isinstance(c, str) else c
    for _, pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return col


def sql_pii_counts(expr: str) -> dict[str, str]:
    """DuckDB equivalents of pii_counts (len(regexp_extract_all) —
    DuckDB's regexp_count is anchored differently across versions, the
    extract-all length is unambiguous)."""
    return {name: f"len(regexp_extract_all({expr}, '{pat}'))"
            for name, pat, _ in PII_PATTERNS}


def sql_pii_scrub(expr: str) -> str:
    """DuckDB equivalent of pii_scrub ('g' = replace all occurrences,
    matching Java replaceAll)."""
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr
