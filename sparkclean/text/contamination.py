"""Benchmark decontamination — word-n-gram overlap against a small
benchmark set (Catalyst + SQL twins).

Implements the published decontamination recipe used for GPT-3 (Brown
et al. 2020, Appendix C), Gopher (Rae et al. 2021, §A.2) and PaLM: a
training document is flagged as contaminated when it shares at least
one word n-gram with any document in an evaluation/benchmark set.  The
classic recipe uses 8-13-grams over a whitespace tokenization; ``n`` is
a parameter here (the gate query uses 5 because the synthetic corpus
has short word-soup documents).

Per document the operator reports the DISTINCT n-gram count, how many
of those n-grams occur anywhere in the benchmark set, and the
contaminated flag (any overlap).  N-grams are space-joined word runs
under the engine-exact tokenizer (:func:`sparkclean.text.shared
.words_col` semantics) hashed with the shared 60-bit md5 — hash-only
matching, same birthday-collision caveat as the reference's public
span-dedup implementations (documented in text/c4.py).

Scale shape (the asymmetry is the whole design): the benchmark side is
tiny (10^4-10^6 eval examples) while the corpus is 10^12 documents —
so the benchmark n-gram set is aggregated once and BROADCAST; the
corpus is scanned exactly once, each row derives its distinct n-gram
hashes locally (array ops, nothing explodes until after the per-row
distinct), and the exploded hashes meet the broadcast set in a
map-side LEFT SEMI join — only matched (doc, hash) rows ever reach the
one small groupBy(doc) shuffle.  The join back onto the per-doc stats
broadcasts the matched counts when they are small (AQE decides).  No
corpus-sized shuffle anywhere; plan-asserted in tests/test_extended_ops.py.

cleanlab has no decontamination operator; this module belongs to the
engine-specific text additions (SURVEY.md §2.12) alongside c4/gopher.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .shared import hash60_col, hash60_sql, words_col, words_sql

DEFAULT_N = 8


def _with_gram_hashes(
    df: DataFrame, text_col: str, n: int, out_col: str, distinct: bool = True
) -> DataFrame:
    """Adds ``out_col`` = n-gram hash array (distinct by default;
    ``distinct=False`` keeps every occurrence — frequency consumers like
    the count-min sketch need multiplicities).  Two projections: the
    words array is materialised first so the per-gram lambda only does
    O(n) ``element_at`` lookups on an attribute (never re-splitting the
    text per element — the interpreted-HOF O(n^2) hazard)."""
    base = df.withColumn(
        "_ng_w", words_col(F.coalesce(F.col(text_col), F.lit("")))
    )
    m = F.size(F.col("_ng_w")) - (n - 1)

    def _gram_at(i: Column) -> Column:
        parts = [F.element_at(F.col("_ng_w"), i + k) for k in range(n)]
        return hash60_col(F.concat_ws(" ", *parts))

    grams = F.when(
        m >= 1, F.transform(F.sequence(F.lit(1), m), _gram_at)
    ).otherwise(F.array().cast("array<long>"))
    if distinct:
        grams = F.array_distinct(grams)
    return base.withColumn(out_col, grams).drop("_ng_w")


def ngram_contamination(
    df: DataFrame,
    bench_df: DataFrame,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """(id, n_ngrams, n_matched, contaminated) for EVERY row of ``df``.

    ``n_ngrams`` counts the document's distinct n-grams, ``n_matched``
    how many of those occur in ANY ``bench_df`` document, and
    ``contaminated`` is ``n_matched > 0``.  Documents with fewer than
    ``n`` words have zero n-grams and are never contaminated.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bench_text_col = bench_text_col or text_col
    # explode_outer + post-Generate null filter, NOT explode: Catalyst's
    # InferFiltersFromGenerate turns plain explode into a size(...)>0
    # filter that pushdown re-inlines as the FULL gram derivation below
    # the Generate — doubling the hashing work per row (CLAUDE.md r1;
    # same dodge as c4_span_dedup's occurrence explode).
    bench_hashes = (
        _with_gram_hashes(bench_df, bench_text_col, n, "_ng_g")
        .select(F.explode_outer("_ng_g").alias("_ng_h"))
        .where(F.col("_ng_h").isNotNull())
        .distinct()
    )
    docs = _with_gram_hashes(df, text_col, n, "_ng_g").select(
        id_col, F.col("_ng_g")
    )
    stats = docs.select(
        id_col, F.size("_ng_g").cast("long").alias("n_ngrams")
    )
    matched = (
        docs.select(id_col, F.explode_outer("_ng_g").alias("_ng_h"))
        .where(F.col("_ng_h").isNotNull())
        .join(F.broadcast(bench_hashes), "_ng_h", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_ng_m"))
    )
    return stats.join(matched, id_col, "left").select(
        id_col,
        "n_ngrams",
        F.coalesce(F.col("_ng_m"), F.lit(0)).cast("long").alias("n_matched"),
        (F.coalesce(F.col("_ng_m"), F.lit(0)) > 0).alias("contaminated"),
    )


def ngram_contamination_sql(
    table: str,
    bench_where: str,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`ngram_contamination` where the benchmark
    set is ``SELECT * FROM table WHERE bench_where`` (the gate's
    deterministic benchmark slice)."""
    gram_expr = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return f"""
WITH ngw AS MATERIALIZED (
  SELECT {id_col} AS id, ({bench_where}) AS is_bench,
         {words_sql(f"coalesce({text_col}, '')")} AS w
  FROM {table}
), grams AS MATERIALIZED (
  SELECT id, is_bench,
         list_distinct(list_transform(
             range(1, greatest(len(w) - {n - 1}, 0) + 1),
             i -> {hash60_sql(f"({gram_expr})")}
         )) AS gset
  FROM ngw
), bench AS MATERIALIZED (
  SELECT DISTINCT h FROM grams, unnest(gset) t(h) WHERE is_bench
), matched AS (
  SELECT g.id, count(*) AS m
  FROM grams g, unnest(g.gset) t(h)
  WHERE h IN (SELECT h FROM bench)
  GROUP BY g.id
)
SELECT g.id AS {id_col},
       len(g.gset)::BIGINT AS n_ngrams,
       coalesce(m.m, 0)::BIGINT AS n_matched,
       coalesce(m.m, 0) > 0 AS contaminated
FROM grams g LEFT JOIN matched m ON m.id = g.id
"""
