"""Per-document top-TF-IDF terms — corpus keyword extraction
(Catalyst + SQL twins).

The classic Sparck Jones weighting: ``score(t, d) = tf(t, d) ·
ln(N / df(t))`` over the engine-exact whitespace tokens; per document
the top ``n_terms`` terms under the deterministic (score DESC, term
ASC) order.  Natural log matches the entropy operators' precedent
(JVM ``Math.log`` and DuckDB ``ln`` agree at the 6-dp output boundary
across the whole gate corpus).

Scale shape: one (id, token) map-side-combined count (tf), one token
count agg (df — skewed hot tokens are exactly what AQE's skew-join
handles on the join back), then a per-document top-k whose
``rank <= n`` filter rides WindowGroupLimit partial/final pushdown —
every map task pre-prunes to n terms per document before the exchange
(plan-asserted).  No collect, no driver-side vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .shared import words_col, words_sql


def top_tfidf_terms(
    df: DataFrame,
    n_terms: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, term, term_rank, score) — the ``n_terms`` highest-TF-IDF
    tokens per document, rank 1-based, score rounded to 6dp at the
    output boundary.  Documents with no tokens emit no rows."""
    if n_terms < 1:
        raise ValueError(f"n_terms must be >= 1, got {n_terms}")
    toks = (
        df.withColumn(
            "_tf_w", words_col(F.coalesce(F.col(text_col), F.lit("")))
        )
        .select(id_col, F.explode_outer("_tf_w").alias("term"))
        .where(F.col("term").isNotNull())
    )
    n_docs = df.count()
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    scored = tf.join(dfreq, "term").withColumn(
        "_score",
        F.col("_tf") * F.log(F.lit(float(n_docs)) / F.col("_df")),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= n_terms)
        .select(
            id_col,
            "term",
            F.col("term_rank").cast("long"),
            F.round("_score", 6).alias("score"),
        )
    )


def top_tfidf_terms_sql(
    table: str,
    n_terms: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`top_tfidf_terms`."""
    return f"""
WITH tf_tok AS MATERIALIZED (
  SELECT {id_col} AS id, t.term
  FROM (
    SELECT {id_col}, {words_sql(f"coalesce({text_col}, '')")} AS w
    FROM {table}
  ), unnest(w) t(term)
), tf_n AS (
  SELECT count(*)::DOUBLE AS n FROM {table}
), tf_tf AS MATERIALIZED (
  SELECT id, term, count(*) AS tf FROM tf_tok GROUP BY id, term
), tf_df AS MATERIALIZED (
  SELECT term, count(*) AS dfreq FROM tf_tf GROUP BY term
), tf_scored AS (
  SELECT t.id, t.term, t.tf * ln((SELECT n FROM tf_n) / d.dfreq) AS score
  FROM tf_tf t JOIN tf_df d USING (term)
), tf_ranked AS (
  SELECT id, term, score,
         row_number() OVER (
             PARTITION BY id ORDER BY score DESC, term ASC
         ) AS term_rank
  FROM tf_scored
)
SELECT id AS {id_col}, term, term_rank::BIGINT AS term_rank,
       round(score, 6) AS score
FROM tf_ranked WHERE term_rank <= {n_terms}
"""
