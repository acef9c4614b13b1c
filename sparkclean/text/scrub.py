"""Compiled-regex PII / toxicity scrubbing.

One ordered chain of ``regexp_replace`` expressions — native, codegen'd,
zero Python (SURVEY.md §2.12).  The pattern dialect is restricted to the
common subset of Java regex (Spark), RE2 (DuckDB oracle) and Python `re`
(the byte-parity reference in tests): character classes, bounded
repetition, alternation, non-capturing groups, ``\\b`` — no lookaround,
no backreferences — so all three engines produce identical bytes.

Order matters (credential URLs before emails before SSN/phone digits);
it is fixed in SCRUB_RULES.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .shared import TOXICITY_LEXICON

_TOX_ALT = "|".join(TOXICITY_LEXICON)

SCRUB_RULES: list[tuple[str, str, str]] = [
    # (name, pattern, replacement)
    ("url_cred", r"https?://[^\s:@]+:[^\s:@]+@[^\s]+", "<URL_CRED>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    (
        "phone",
        r"(?:\+[0-9]{1,2}[ -])?(?:\([0-9]{3}\)[ -]?|[0-9]{3}[ -])[0-9]{3}[ -]?[0-9]{4}\b",
        "<PHONE>",
    ),
    ("toxicity", r"(?i)\b(?:" + _TOX_ALT + r")\b", "<TOX>"),
]


def scrub_col(text: Column) -> Column:
    """Catalyst scrub chain (Spark production path)."""
    out = text
    for _, pattern, repl in SCRUB_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def scrub_sql(text: str) -> str:
    """DuckDB twin of :func:`scrub_col`."""
    out = text
    for _, pattern, repl in SCRUB_RULES:
        # DuckDB string literals keep backslashes literal — only quotes
        # need escaping.
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


_COMPILED = [(re.compile(p), r) for _, p, r in SCRUB_RULES]


def scrub_py(text: str) -> str:
    """Plain-Python reference (byte-parity oracle for tests, FIXTURES.md F5)."""
    for rx, repl in _COMPILED:
        text = rx.sub(repl, text)
    return text
