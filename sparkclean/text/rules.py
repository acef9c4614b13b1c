"""Heuristic caption-quality rules — pure Catalyst SQL expressions
(SURVEY.md §2.12 "Heuristic rules"), with DuckDB-SQL twins for the oracle.

All ratios are computed on the raw string; token-level rules use
whitespace tokens.  Everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .shared import (
    ENGLISH_STOPWORDS,
    ascii_lower_col,
    ascii_lower_sql,
    lit_str_array,
    sql_str_list,
    words_col,
    words_sql,
)


def _ratio_col(text: Column, char_class: str) -> Column:
    n = F.length(text)
    kept = F.length(F.regexp_replace(text, f"[^{char_class}]", ""))
    return F.when(n > 0, kept.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def _ratio_sql(text: str, char_class: str) -> str:
    return (
        f"CASE WHEN length({text}) > 0 THEN "
        f"length(regexp_replace({text}, '[^{char_class}]', '', 'g'))::DOUBLE / length({text}) "
        f"ELSE 0.0 END"
    )


def digit_ratio_col(text: Column) -> Column:
    return _ratio_col(text, "0-9")


def alpha_ratio_col(text: Column) -> Column:
    return _ratio_col(text, "A-Za-z")


def punct_ratio_col(text: Column) -> Column:
    return _ratio_col(text, r"!-/:-@\[-`{-~")


def upper_ratio_col(text: Column) -> Column:
    return _ratio_col(text, "A-Z")


def repetition_ratio_col(text: Column) -> Column:
    """1 - distinct_tokens/tokens: fraction of repeated whitespace tokens."""
    w = words_col(text)
    n = F.size(w)
    return F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def stopword_ratio_col(text: Column) -> Column:
    w = words_col(ascii_lower_col(text))
    n = F.size(w)
    sw = lit_str_array(ENGLISH_STOPWORDS)
    hits = F.size(F.filter(w, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def word_count_col(text: Column) -> Column:
    return F.size(words_col(text))


def with_quality_features(df: DataFrame, text_col: str = "caption") -> DataFrame:
    """Append the full heuristic feature block in one projection."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.length(t).alias("n_chars"),
        word_count_col(t).alias("n_words"),
        digit_ratio_col(t).alias("digit_ratio"),
        alpha_ratio_col(t).alias("alpha_ratio"),
        punct_ratio_col(t).alias("punct_ratio"),
        upper_ratio_col(t).alias("upper_ratio"),
        repetition_ratio_col(t).alias("repetition_ratio"),
        stopword_ratio_col(t).alias("stopword_ratio"),
    )


# ----------------------------------------------------------- oracle SQL


def quality_features_sql_exprs(text: str) -> dict[str, str]:
    """DuckDB expressions mirroring :func:`with_quality_features`."""
    w = words_sql(text)
    wl = words_sql(ascii_lower_sql(text))
    sw = sql_str_list(ENGLISH_STOPWORDS)
    return {
        "n_chars": f"length({text})",
        "n_words": f"len({w})",
        "digit_ratio": _ratio_sql(text, "0-9"),
        "alpha_ratio": _ratio_sql(text, "A-Za-z"),
        "punct_ratio": _ratio_sql(text, r"!-/:-@\[-`{-~"),
        "upper_ratio": _ratio_sql(text, "A-Z"),
        "repetition_ratio": (
            f"CASE WHEN len({w}) > 0 THEN 1.0 - len(list_distinct({w}))::DOUBLE / len({w}) "
            f"ELSE 0.0 END"
        ),
        "stopword_ratio": (
            f"CASE WHEN len({wl}) > 0 THEN "
            f"len(list_filter({wl}, t -> list_contains({sw}, t)))::DOUBLE / len({wl}) "
            f"ELSE 0.0 END"
        ),
    }
