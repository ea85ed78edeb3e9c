"""PII detection and redaction for training-corpus scrubbing.

Emails, IPv4 addresses, and international-format phone numbers are the
three patterns every corpus pipeline scrubs first (C4 drops lines with
them; most production pipelines mask instead so surrounding text
survives). All pure Column expressions over ``regexp_replace`` /
``regexp_count`` — JVM-side, codegen-friendly, linear per row, scales
with the scan.

Pattern dialect: restricted to the syntax Java regex and RE2 share
(character classes, bounded repetition — no lookaround, no backrefs), so
the DuckDB oracle runs the IDENTICAL pattern strings. That restriction is
also the 100 TB posture: patterns any engine in the stack (Spark, DuckDB,
Flink, ClickHouse) executes the same way.

No reference counterpart (extension per the builder's brief).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import ColumnOrName, _c

# Java-regex ∩ RE2 common dialect only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "phone": r"\+[0-9]{7,15}",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "[EMAIL]",
    "ipv4": "[IP]",
    "phone": "[PHONE]",
}


def pii_counts(col: ColumnOrName) -> dict[str, Column]:
    """Per-kind occurrence counts (fixed kind order)."""
    c = _c(col)
    return {kind: F.regexp_count(c, F.lit(p)) for kind, p in PII_PATTERNS.items()}


def redact_pii(col: ColumnOrName, kinds: tuple[str, ...] = ("email", "ipv4", "phone")) -> Column:
    """Replace every PII match with its kind token, applying kinds in the
    given order (email before ipv4 matters: 'a@1.2.3.4' is an email)."""
    out = _c(col)
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], REDACTION_TOKENS[kind])
    return out


def has_pii(col: ColumnOrName) -> Column:
    """True when any pattern matches — the C4-style drop gate."""
    c = _c(col)
    cond = F.lit(False)
    for p in PII_PATTERNS.values():
        cond = cond | (F.regexp_count(c, F.lit(p)) > 0)
    return cond
