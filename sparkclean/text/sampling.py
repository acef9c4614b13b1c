"""Deterministic corpus sampling — per-domain caps and mixture weights
(Catalyst + SQL twins).

Two standard knobs every published web-corpus recipe turns between
dedup and training (C4 / RefinedWeb / FineWeb / Dolma lineage):

* **Per-domain cap** — at most ``cap`` documents per domain/source, so
  boilerplate-heavy hosts cannot dominate the corpus.  The selection
  must be deterministic AND order-free at 10^12 rows, so the rank is a
  seeded hash order (hash60 of the document id), not arrival order or
  a random() that breaks resume/replay.
* **Mixture weights** — per-source token shares plus the sampling
  weight that would rebalance the corpus to a uniform target mixture
  (weight_s = target_share / actual_share, the DoReMi-style reweighting
  identity with a fixed uniform target).

Scale shape: the cap is one hash-partition shuffle on the source key
with a per-source ``row_number`` — hot domains are EXACTLY the rows the
operator exists to bound, and when only the kept rows are needed
(``kept_only=True``, the production path) the ``rank <= cap`` filter
rides Spark's WindowGroupLimit partial/final pushdown, so each map task
pre-prunes to ``cap`` rows per source before the exchange and no hot
domain ever funnels through one window task (plan-asserted).  Mixture
weights are one map-side-combined aggregate to S rows plus a broadcast
of the 1-row total.

cleanlab has no sampling operators; this module belongs to the
engine-specific text additions (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .shared import hash60_col, hash60_sql
from .tokenize import ws_token_count_col, ws_token_count_sql


def source_cap_sample(
    df: DataFrame,
    cap: int = 100,
    source_col: str = "source",
    id_col: str = "doc_id",
    kept_only: bool = False,
) -> DataFrame:
    """(id, source, sample_rank, kept) — ``sample_rank`` is the
    document's 1-indexed position within its source under the
    deterministic hash60(id) order (ties broken by id), ``kept`` is
    ``sample_rank <= cap``.  With ``kept_only`` the survivors are
    returned directly and the rank filter is pushed into the exchange
    (WindowGroupLimit)."""
    h = hash60_col(F.col(id_col).cast("string"))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    ranked = df.select(id_col, source_col).withColumn(
        "sample_rank", F.row_number().over(w).cast("long")
    )
    if kept_only:
        return ranked.where(F.col("sample_rank") <= cap).withColumn(
            "kept", F.lit(True)
        )
    return ranked.withColumn("kept", F.col("sample_rank") <= cap)


def source_cap_sample_sql(
    table: str,
    cap: int = 100,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`source_cap_sample` (full output form)."""
    h = hash60_sql(f"{id_col}::VARCHAR")
    return f"""
SELECT {id_col}, {source_col},
       row_number() OVER (
           PARTITION BY {source_col} ORDER BY {h}, {id_col}
       )::BIGINT AS sample_rank,
       row_number() OVER (
           PARTITION BY {source_col} ORDER BY {h}, {id_col}
       ) <= {cap} AS kept
FROM {table}
"""


def corpus_sample(
    df: DataFrame,
    size: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic uniform corpus sample of exactly ``size`` rows
    (fewer if the corpus is smaller): the ``size`` lowest ids under the
    seeded hash60 order, ties by id.  (id, sample_key) rows.

    Scale shape: ORDER BY + LIMIT plans as TakeOrderedAndProject —
    every task keeps a ``size``-bounded heap and only those survivors
    reach the driver-side merge; no global sort, no shuffle of the
    corpus (plan-asserted).  Hash order makes the sample independent of
    physical layout — stable across repartitions, resumes and replays,
    unlike ``df.limit`` (arbitrary rows) or ``rand()`` (different every
    run)."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    key = hash60_col(F.col(id_col).cast("string"))
    return (
        df.select(id_col, key.alias("sample_key"))
        .orderBy(F.col("sample_key").asc(), F.col(id_col).asc())
        .limit(size)
    )


def corpus_sample_sql(table: str, size: int, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`corpus_sample`."""
    h = hash60_sql(f"{id_col}::VARCHAR")
    return f"""
SELECT {id_col}, {h} AS sample_key
FROM {table}
ORDER BY sample_key, {id_col}
LIMIT {size}
"""


def hash_fraction_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    denominator: int = 1_000_000,
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sampling: (id, kept) where
    ``kept = hash60(id) mod denominator < round(fraction*denominator)``
    — the replay-safe analogue of ``df.sample(fraction)`` (same rows
    every run, on every cluster, after every resume).  Row-local, no
    shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = round(fraction * denominator)
    key = hash60_col(F.col(id_col).cast("string"))
    return df.select(
        id_col, (key % denominator < cut).alias("kept")
    )


def hash_fraction_sample_sql(
    table: str,
    fraction: float,
    id_col: str = "doc_id",
    denominator: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`hash_fraction_sample`."""
    cut = round(fraction * denominator)
    h = hash60_sql(f"{id_col}::VARCHAR")
    return f"""
SELECT {id_col}, ({h} % {denominator}) < {cut} AS kept
FROM {table}
"""


def source_mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, n_tokens, token_share, mixture_weight) — one row
    per source.  ``token_share`` is the source's fraction of all
    whitespace tokens; ``mixture_weight`` is the per-source sampling
    weight that rebalances to the uniform target mixture
    ((1/S) / share); both rounded to 6dp at the output boundary.  A
    zero-token source gets a null weight."""
    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            ws_token_count_col(F.coalesce(F.col(text_col), F.lit("")))
        ).cast("long").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("_smw_tot"),
        F.count(F.lit(1)).cast("double").alias("_smw_s"),
    )
    share = F.col("n_tokens") / F.col("_smw_tot")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            F.round(share, 6).alias("token_share"),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    (F.lit(1.0) / F.col("_smw_s")) / share,
                ),
                6,
            ).alias("mixture_weight"),
        )
    )


def source_mixture_weights_sql(
    table: str, source_col: str = "source", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`source_mixture_weights`."""
    return f"""
WITH per AS MATERIALIZED (
  SELECT {source_col},
         count(*) AS n_docs,
         sum({ws_token_count_sql(f"coalesce({text_col}, '')")})::BIGINT AS n_tokens
  FROM {table} GROUP BY {source_col}
), tot AS (
  SELECT sum(n_tokens)::DOUBLE AS t, count(*)::DOUBLE AS s FROM per
)
SELECT {source_col}, n_docs, n_tokens,
       round(n_tokens / t, 6) AS token_share,
       round(CASE WHEN n_tokens > 0
                  THEN (1.0 / s) / (n_tokens / t) END, 6) AS mixture_weight
FROM per, tot
"""
