"""Dropped-by-rule histogram over the document quality-filter chain.

The counters artifact the pipeline writes alongside each snapshot
(lineage + "rows scored, dropped-by-rule histograms"): every document is
attributed to the FIRST rule it violates in the fixed chain

1. ``too_few_words``     — fewer than :data:`MIN_WORDS_DOC` words
                           (Gopher's minimum-length gate, Rae et al.
                           2021 Table A1 lower bound);
2. ``c4_page``           — fails the C4 page vetoes
                           (:func:`sparkclean.text.c4.c4_line_clean`);
3. ``gopher_repetition`` — fails the Gopher repetition thresholds
                           (:func:`sparkclean.text.gopher.gopher_repetition`);
4. ``kept``              — survives everything.

Both the Spark side and the DuckDB twin COMPOSE the already-verified
operator/oracle pairs and only add the case chain + one groupBy, so
there is no new twin-sync surface: if the operators agree, the report
agrees.  Scale shape: two id-keyed joins of id+boolean frames (the
operator outputs), one K-sized groupBy — nothing wider than an id
crosses a shuffle beyond the underlying operators themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import c4 as _c4
from . import gopher as _gopher
from .rules import word_count_col
from .shared import words_sql

#: Gopher's minimum document length (Table A1 uses a 50-word floor).
MIN_WORDS_DOC = 50

RULES = ("too_few_words", "c4_page", "gopher_repetition", "kept")


def document_quality_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(rule, n_docs) — first-violated-rule histogram; rules with zero
    documents emit no row (groupBy semantics, identical in the twin)."""
    wc = df.select(
        id_col, word_count_col(F.col(text_col)).alias("_n_words")
    )
    ck = _c4.c4_line_clean(df, text_col, id_col).select(
        id_col, F.col("keep").alias("_c4_keep")
    )
    gk = _gopher.gopher_repetition(df, text_col, id_col).select(
        id_col, F.col("keep").alias("_gopher_keep")
    )
    rule = (
        F.when(F.col("_n_words") < MIN_WORDS_DOC, F.lit("too_few_words"))
        .when(~F.col("_c4_keep"), F.lit("c4_page"))
        .when(~F.col("_gopher_keep"), F.lit("gopher_repetition"))
        .otherwise(F.lit("kept"))
    )
    return (
        wc.join(ck, id_col)
        .join(gk, id_col)
        .select(rule.alias("rule"))
        .groupBy("rule")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def document_quality_report_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`document_quality_report` — composes the
    operator oracles verbatim."""
    return f"""
WITH qr_wc AS (
  SELECT {id_col}, len({words_sql(text_col)}) AS n_words FROM {table}
), qr_c4 AS MATERIALIZED ({_c4.c4_line_clean_sql(table, text_col, id_col)}),
qr_gph AS MATERIALIZED ({_gopher.gopher_repetition_sql(table, text_col, id_col)})
SELECT rule, count(*)::BIGINT AS n_docs
FROM (
  SELECT CASE WHEN w.n_words < {MIN_WORDS_DOC} THEN 'too_few_words'
              WHEN NOT c.keep THEN 'c4_page'
              WHEN NOT g.keep THEN 'gopher_repetition'
              ELSE 'kept' END AS rule
  FROM qr_wc w
  JOIN qr_c4 c ON c.{id_col} = w.{id_col}
  JOIN qr_gph g ON g.{id_col} = w.{id_col}
)
GROUP BY rule
"""
