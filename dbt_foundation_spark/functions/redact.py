"""PII / secret redaction for training-data curation (SURVEY §2.L D4).

Pure Column expressions: each pattern is one ``regexp_replace`` inside
whole-stage codegen, so scrubbing a 100 TB corpus is a single map stage
with no shuffle and no Python. Patterns are deliberately RE2-safe (no
lookaround, no backreferences) so the exact same regex runs in Spark
(java.util.regex), DuckDB (RE2) and most other engines — which is what
lets the DuckDB oracle replay the full scrub.

Reference parity: the dbt reference ships no redaction (it delegates all
compute to its warehouse); this is part of the BASELINE.json Cat-D
training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied IN ORDER. Email must run before
# the key pattern (the local-part could contain 32+ hex chars); the key
# pattern (32+ hex chars: md5/sha/api tokens) must run before IP so a
# dotted quad inside a longer token is never half-scrubbed.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("key", r"\b[0-9a-fA-F]{32,}\b", "<KEY>"),
    ("ip", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(col: Column | str) -> Column:
    """Scrub every PII_PATTERNS occurrence, in declaration order."""
    out = _c(col)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category match counts on the RAW text (pre-scrub), bigint.

    Counted independently per pattern — a token can match two categories
    (it is then scrubbed by whichever pattern runs first)."""
    c = _c(col)
    return {
        name: F.regexp_count(c, F.lit(pat)).cast("bigint")
        for name, pat, _ in PII_PATTERNS
    }


def pii_sql(text_expr: str) -> tuple[str, dict[str, str]]:
    """DuckDB twin: (scrub expression, per-category count expressions).

    DuckDB's regexp_replace is first-match-only without the 'g' flag —
    Spark's replaces all — so every replace carries 'g'."""
    scrub = text_expr
    for _, pat, repl in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    counts = {
        name: f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT)"
        for name, pat, _ in PII_PATTERNS
    }
    return scrub, counts
