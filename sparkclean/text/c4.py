"""C4-style line-level cleaning — Catalyst + SQL twins plus an Arrow
production kernel.

Implements the heuristic cleaning stage of C4 (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning with a Unified Text-to-Text
Transformer", §2.2 — public), the companion of the Gopher repetition
rules in :mod:`sparkclean.text.gopher`:

Line level (a line is kept only if ALL hold):

* ends in a terminal punctuation mark (``.``, ``!``, ``?``, ``"``) —
  checked on the raw line, no stripping;
* has at least ``MIN_WORDS_PER_LINE`` (5) words under the engine-exact
  tokenizer (:func:`sparkclean.text.shared.words_py` semantics);
* does not contain the word "javascript" (case-insensitive substring).

Page level (``keep`` is true only if ALL hold):

* the CLEANED text contains at least ``MIN_SENTENCES`` (3) sentence
  terminators (count of ``.``/``!``/``?`` — C4 counts sentences; the
  terminator count is the deterministic cross-engine proxy, documented);
* the original text does not contain "lorem ipsum" (case-insensitive);
* the original text does not contain a curly brace ``{``;
* the original text contains no term from the shared toxicity lexicon
  (:data:`sparkclean.text.shared.TOXICITY_LEXICON` stands in for C4's
  "List of Dirty, Naughty, Obscene or Otherwise Bad Words" — swap the
  lexicon for production, same machinery as text.scrub).

Output per document: the cleaned text (kept lines joined with ``\\n``),
kept-line count, sentence-terminator count, and the keep flag.

Scale shape: the production path is ONE Arrow pandas UDF pass — no
shuffle, no join, partitioning inherited from the scan (same plan shape
as gopher; plan-asserted).  The Catalyst twin is a single projection
with one ``filter()`` higher-order function over the split lines —
per-element work is O(line length) on a handful of lines per document,
nowhere near the interpreted-HOF hazards documented in CLAUDE.md (no
array-valued subexpression is referenced per element).

Reference behaviour note: cleanlab has no line-cleaning operator; this
module belongs to the engine-specific text-analysis additions
(SURVEY.md §2.12) next to rules/scrub/gopher.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .shared import TOXICITY_LEXICON, words_py, words_sql

MIN_WORDS_PER_LINE = 5
MIN_SENTENCES = 3
TERMINALS = (".", "!", "?", '"')


# ------------------------------------------------------------ Catalyst

def _keep_line(x: Column) -> Column:
    words = F.when(F.trim(x) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(x), r"\s+")
    )
    return (
        F.substring(x, -1, 1).isin(*TERMINALS)
        & (F.size(words) >= MIN_WORDS_PER_LINE)
        & ~F.contains(F.lower(x), F.lit("javascript"))
    )


def c4_line_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_arrow: bool = True,
) -> DataFrame:
    """(id, cleaned, n_lines_kept, n_sentences, keep) per input row.
    Null text cleans to the empty string and is dropped (0 sentences)."""
    if use_arrow:
        feat = with_c4_clean(df, text_col, "_c4")
        cleaned = F.col("_c4.cleaned")
        n_kept = F.col("_c4.n_lines_kept")
    else:
        base = df.withColumn(
            "_c4_lines",
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1),
        ).withColumn("_c4_kept", F.filter(F.col("_c4_lines"), _keep_line))
        feat = base
        cleaned = F.array_join(F.col("_c4_kept"), "\n")
        n_kept = F.size(F.col("_c4_kept"))
    n_sent = (F.size(F.split(cleaned, r"[.!?]", -1)) - 1).cast("long")
    raw_lower = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    page_ok = (
        (n_sent >= MIN_SENTENCES)
        & ~F.contains(raw_lower, F.lit("lorem ipsum"))
        & ~F.contains(raw_lower, F.lit("{"))
    )
    for w in TOXICITY_LEXICON:
        page_ok = page_ok & ~F.contains(raw_lower, F.lit(w))
    return feat.select(
        id_col,
        cleaned.alias("cleaned"),
        n_kept.cast("long").alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        page_ok.alias("keep"),
    )


def c4_line_clean_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`c4_line_clean`."""
    terms = ", ".join(f"'{t}'" for t in TERMINALS)
    bad = " AND ".join(
        f"NOT contains(raw_lower, '{w}')" for w in TOXICITY_LEXICON
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT {id_col} AS id,
         lower(coalesce({text_col}, '')) AS raw_lower,
         list_filter(
             string_split(coalesce({text_col}, ''), chr(10)),
             x -> right(x, 1) IN ({terms})
                  AND len({words_sql('x')}) >= {MIN_WORDS_PER_LINE}
                  AND NOT contains(lower(x), 'javascript')
         ) AS kept
  FROM {table}
), feat AS (
  SELECT id, raw_lower,
         -- DuckDB array_to_string([]) is NULL, not '' — coalesce to
         -- match Spark's array_join and the Python kernel
         coalesce(array_to_string(kept, chr(10)), '') AS cleaned,
         len(kept)::BIGINT AS n_lines_kept
  FROM base
)
SELECT id AS {id_col}, cleaned, n_lines_kept,
       (len(string_split_regex(cleaned, '[.!?]')) - 1)::BIGINT AS n_sentences,
       ((len(string_split_regex(cleaned, '[.!?]')) - 1) >= {MIN_SENTENCES}
        AND NOT contains(raw_lower, 'lorem ipsum')
        AND NOT contains(raw_lower, '{{')
        AND {bad}) AS keep
FROM feat
"""


# ------------------------------------------------- Arrow production path

_SENT_RE = re.compile(r"[.!?]")
_TERM_SET = frozenset(TERMINALS)


def c4_clean_py(text: str | None) -> tuple[str, int]:
    """(cleaned, n_lines_kept) for ONE document — value-identical to the
    Catalyst and DuckDB routes."""
    if text is None:
        text = ""
    kept = [
        ln
        for ln in text.split("\n")
        if ln[-1:] in _TERM_SET
        and len(words_py(ln)) >= MIN_WORDS_PER_LINE
        and "javascript" not in ln.lower()
    ]
    return "\n".join(kept), len(kept)


def c4_keep_py(text: str | None, cleaned: str) -> bool:
    raw_lower = (text or "").lower()
    return (
        len(_SENT_RE.findall(cleaned)) >= MIN_SENTENCES
        and "lorem ipsum" not in raw_lower
        and "{" not in raw_lower
        and not any(w in raw_lower for w in TOXICITY_LEXICON)
    )


def with_c4_clean(
    df: DataFrame, text_col: str = "text", out_col: str = "c4"
) -> DataFrame:
    """Production path: one Arrow batch pass (struct of cleaned text and
    kept-line count); sentence count and page flags are cheap native
    expressions layered on top by :func:`c4_line_clean`."""

    @pandas_udf("struct<cleaned: string, n_lines_kept: long>")
    def _clean(texts: pd.Series) -> pd.DataFrame:
        rows = [c4_clean_py(t) for t in texts]
        return pd.DataFrame(rows, columns=["cleaned", "n_lines_kept"])

    return df.withColumn(out_col, _clean(F.col(text_col)))
