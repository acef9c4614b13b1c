"""Token counting and document fingerprinting — native Catalyst + SQL twins."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .shared import (
    TOKEN_REGEX,
    ascii_lower_col,
    ascii_lower_sql,
    hash60_col,
    hash60_sql,
    words_col,
    words_sql,
)


def ws_token_count_col(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_col(text))


def ws_token_count_sql(text: str) -> str:
    return f"len({words_sql(text)})"


def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish token count: letter runs | digit runs | single symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def bpe_token_count_sql(text: str) -> str:
    return f"len(regexp_extract_all({text}, '{TOKEN_REGEX}'))"


def _normalized(text: Column) -> Column:
    return F.trim(F.regexp_replace(ascii_lower_col(text), r"\s+", " "))


def fingerprint_col(text: Column) -> Column:
    """60-bit fingerprint of the whitespace-normalised, lowercased text —
    the exact-dedup key."""
    return hash60_col(_normalized(text))


def fingerprint_sql(text: str) -> str:
    from .shared import WS_CLASS_SQL

    # explicit ASCII class, not '\s': RE2's \s misses vertical tab
    norm = f"trim(regexp_replace({ascii_lower_sql(text)}, '{WS_CLASS_SQL}', ' ', 'g'), ' ')"
    return hash60_sql(norm)
