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


# ------------------------------------------------ end-to-end prep pipeline

def document_prep_pipeline(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The full training-data prep flow as ONE composition of verified
    operators — the text-axis counterpart of the image keep-drop bench
    pipeline:

    1. C4 line cleaning rewrites each page; its page vetoes gate;
    2. Gopher repetition thresholds gate the CLEANED text;
    3. within-document line dedup rewrites the survivors' text;
    4. GPT-style benchmark decontamination (bench slice
       ``id % 49 == 0`` over the rewritten corpus) drops contaminated
       docs;
    5. a per-domain cap (10, seeded hash order) bounds each source;
    6. the survivors pack into 256-token training sequences
       (distributed prefix sum).

    Output: (id, n_tokens, stream_offset, bin_id, n_bins_spanned) for
    every surviving document.  Like document_quality_report, BOTH
    sides compose the already-verified operator/oracle pairs (id-keyed
    joins of operator outputs + filters), so the composition adds no
    new twin-sync surface.  Scale shape: each stage keeps its own
    audited plan; the glue is id-equi joins of id+flag frames and one
    broadcast of the id+source dimension columns.
    """
    from . import contamination as _contam
    from . import linededup as _linededup
    from . import packing as _packing
    from . import sampling as _sampling

    c4 = _c4.c4_line_clean(df, text_col, id_col).select(
        id_col, "cleaned", F.col("keep").alias("_pp_c4_keep")
    )
    cleaned = c4.select(id_col, F.col("cleaned").alias("text"))
    gk = _gopher.gopher_repetition(cleaned, "text", id_col).select(
        id_col, F.col("keep").alias("_pp_gph_keep")
    )
    dl = _linededup.dedup_lines(cleaned, "text", id_col).select(
        id_col, "deduped_text"
    )
    deduped = dl.select(id_col, F.col("deduped_text").alias("text"))
    ct = _contam.ngram_contamination(
        deduped, deduped.where(F.col(id_col) % 49 == 0), n=5,
        text_col="text", id_col=id_col,
    ).select(id_col, "contaminated")
    surv = (
        c4.join(gk, id_col)
        .join(dl, id_col)
        .join(ct, id_col)
        .where(
            F.col("_pp_c4_keep")
            & F.col("_pp_gph_keep")
            & ~F.col("contaminated")
        )
        .join(F.broadcast(df.select(id_col, "source")), id_col)
        .select(id_col, "deduped_text", "source")
    )
    capped = _sampling.source_cap_sample(
        surv, cap=10, source_col="source", id_col=id_col, kept_only=True
    ).select(id_col)
    final = surv.join(capped, id_col).select(
        id_col, F.col("deduped_text").alias("text")
    )
    return _packing.pack_sequences(final, budget=256, text_col="text", id_col=id_col)


def document_prep_pipeline_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`document_prep_pipeline` — composes the
    operator oracles verbatim as nested CTEs."""
    from . import contamination as _contam
    from . import linededup as _linededup
    from . import packing as _packing
    from . import sampling as _sampling

    gph = _gopher.gopher_repetition_sql(
        f"(SELECT {id_col}, cleaned AS text FROM pp_c4) g0", "text", id_col
    )
    dl = _linededup.dedup_lines_sql(
        f"(SELECT {id_col}, cleaned AS text FROM pp_c4) d0", "text", id_col
    )
    ct = _contam.ngram_contamination_sql(
        f"(SELECT {id_col}, deduped_text AS text FROM pp_dl) c0",
        f"{id_col} % 49 = 0", n=5, text_col="text", id_col=id_col,
    )
    cap = _sampling.source_cap_sample_sql(
        f"(SELECT {id_col}, source FROM pp_surv) s0", cap=10,
        source_col="source", id_col=id_col,
    )
    pack = _packing.pack_sequences_sql(
        f"""(SELECT s.{id_col}, s.deduped_text AS text
   FROM pp_surv s JOIN pp_cap k ON k.{id_col} = s.{id_col} AND k.kept) p0""",
        budget=256, text_col="text", id_col=id_col,
    )
    return f"""
WITH pp_c4 AS MATERIALIZED ({_c4.c4_line_clean_sql(table, text_col, id_col)}),
pp_gph AS MATERIALIZED ({gph}),
pp_dl AS MATERIALIZED ({dl}),
pp_ct AS MATERIALIZED ({ct}),
pp_surv AS MATERIALIZED (
  SELECT c.{id_col}, d.deduped_text, doc.source
  FROM pp_c4 c
  JOIN pp_gph g ON g.{id_col} = c.{id_col}
  JOIN pp_dl d ON d.{id_col} = c.{id_col}
  JOIN pp_ct t ON t.{id_col} = c.{id_col}
  JOIN (SELECT {id_col}, source FROM {table}) doc ON doc.{id_col} = c.{id_col}
  WHERE c.keep AND g.keep AND NOT t.contaminated
),
pp_cap AS MATERIALIZED ({cap})
SELECT * FROM ({pack}) pp_final
"""
