"""Deterministic count-min sketch — bounded-size corpus frequency
estimation for heavy-hitter n-grams.

The exact corpus gram-frequency table needs a groupBy over ALL distinct
grams (10^12-scale output); the count-min sketch (Cormode &
Muthukrishnan 2005) bounds BOTH the shuffle and the output at
k·2^m_bits counters: map-side partial aggregation reduces every task's
contribution to ≤ k·m rows, the final counter table collects in one
bounded action, and estimates are then a broadcast lookup — the
standard primitive behind corpus boilerplate detection (which grams
repeat enough to matter) without materialising the gram table.

Like :mod:`sparkclean.dedup.bloom`, the sketch is built with exact
integer double hashing over the shared 60-bit gram hashes (same
position schedule, one row per hash function), so Spark, DuckDB and
NumPy construct bit-identical counter tables and the ESTIMATES agree
hash-exactly across engines — including the overcounts (CMS never
undercounts: est(h) = min_i C[i][pos_i(h)] ≥ true count).

Scale shape: pass 1 explodes (row, position) pairs but the
groupBy(row, pos) combines map-side to ≤ k·m rows per task before the
exchange — the shuffle is config-bounded, not data-bounded; the
counter table (k·m longs) collects once and closes over an Arrow
kernel; pass 2 is a corpus scan with NO join and NO shuffle
(plan-asserted in tests/test_cms.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..text.contamination import _with_gram_hashes
from .bloom import bloom_positions_np

M_BITS_DEFAULT = 12
K_DEFAULT = 4


def cms_estimate_np(
    gh: np.ndarray, table: np.ndarray, m_bits: int
) -> np.ndarray:
    """min-over-rows estimates for nonnegative 60-bit hashes against a
    (k, 2^m_bits) counter table."""
    k = table.shape[0]
    pos = bloom_positions_np(gh, m_bits, k)
    est = table[0][pos[0]]
    for i in range(1, k):
        est = np.minimum(est, table[i][pos[i]])
    return est


def build_cms(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
) -> np.ndarray:
    """(k, 2^m_bits) int64 counter table over every n-gram OCCURRENCE
    of the corpus.  The groupBy(row, pos) partial-aggregates map-side,
    so the exchange carries ≤ k·2^m_bits rows per task regardless of
    corpus size; the collect is one bounded action."""
    m = 1 << m_bits
    ghs = (
        _with_gram_hashes(df, text_col, n, "_cm_g", distinct=False)
        .select(F.explode_outer("_cm_g").alias("_cm_h"))
        .where(F.col("_cm_h").isNotNull())
    )
    h1 = F.col("_cm_h") % m
    h2 = (F.shiftright(F.col("_cm_h"), 20) % m) * 2 + 1
    rows = ghs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), ((h1 + i * h2) % m).alias("p")
                    )
                    for i in range(k)
                ]
            )
        ).alias("_cm")
    ).select("_cm.i", "_cm.p")
    counts = rows.groupBy("i", "p").agg(F.count(F.lit(1)).alias("c")).collect()
    table = np.zeros((k, m), dtype=np.int64)
    for r in counts:
        table[r["i"], r["p"]] = r["c"]
    return table


def cms_gram_frequency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
) -> DataFrame:
    """(id, n_grams, max_est_freq) per document: the corpus-frequency
    CMS estimate of the document's most-repeated n-gram (its
    boilerplate ceiling).  ``n_grams`` counts distinct grams; documents
    with no grams get 0/0."""
    table = build_cms(df, text_col, n, m_bits, k)

    @pandas_udf("long")
    def _max_est(ghs: pd.Series) -> pd.Series:
        lens = np.fromiter(
            (len(x) for x in ghs), dtype=np.int64, count=len(ghs)
        )
        total = int(lens.sum())
        if total == 0:
            return pd.Series(np.zeros(len(ghs), dtype=np.int64))
        flat = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in ghs if len(x)]
        )
        est = cms_estimate_np(flat, table, m_bits)
        # reduceat over the NONEMPTY rows' start offsets only: empty
        # rows share their successor's offset and would corrupt the
        # segmentation; they stay at the 0 default instead
        out = np.zeros(len(ghs), dtype=np.int64)
        nonempty = np.flatnonzero(lens)
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        out[nonempty] = np.maximum.reduceat(est, starts[nonempty])
        return pd.Series(out)

    docs = _with_gram_hashes(df, text_col, n, "_cm_g")
    return docs.select(
        id_col,
        F.size("_cm_g").cast("long").alias("n_grams"),
        _max_est(F.col("_cm_g")).alias("max_est_freq"),
    )


def cms_gram_frequency_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
) -> str:
    """DuckDB twin of :func:`cms_gram_frequency` — builds the identical
    counter table from occurrence counts and takes the same min-over-
    rows / max-over-grams."""
    from ..text.shared import hash60_sql, words_sql

    m = 1 << m_bits
    h2_shift = 1 << 20
    gram_expr = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    pos_structs = ", ".join(
        f"{{'i': {i}, 'p': (h % {m} + {i} * (((h // {h2_shift}) % {m}) * 2 + 1)) % {m}}}"
        for i in range(k)
    )
    probe_structs = ", ".join(
        f"{{'i': {i}, 'p': (h1 + {i} * hh2) % {m}}}" for i in range(k)
    )
    return f"""
WITH cmw AS MATERIALIZED (
  SELECT {id_col} AS id, {words_sql(f"coalesce({text_col}, '')")} AS w
  FROM {table}
), cmall AS MATERIALIZED (
  SELECT id, h
  FROM (
    SELECT id, list_transform(
        range(1, greatest(len(w) - {n - 1}, 0) + 1),
        i -> {hash60_sql(f"({gram_expr})")}
    ) AS gs FROM cmw
  ), unnest(gs) t(h)
), cmtable AS MATERIALIZED (
  SELECT u.s.i AS i, u.s.p AS p, count(*) AS c
  FROM cmall, unnest([{pos_structs}]) u(s)
  GROUP BY 1, 2
), cmdistinct AS MATERIALIZED (
  SELECT id, h, h % {m} AS h1, ((h // {h2_shift}) % {m}) * 2 + 1 AS hh2
  FROM (SELECT DISTINCT id, h FROM cmall)
), cmprobe AS MATERIALIZED (
  -- unnest the k probe positions so the counter lookup is a plain
  -- (i, p) equi-join (a computed-key join degenerates to a loop join)
  SELECT id, h, u.s.i AS i, u.s.p AS p
  FROM cmdistinct, unnest([{probe_structs}]) u(s)
), cmest AS (
  SELECT c.id, c.h, min(t.c) AS est
  FROM cmprobe c JOIN cmtable t USING (i, p)
  GROUP BY c.id, c.h
  HAVING count(*) = {k}
), cmdoc AS (
  SELECT id, count(*) AS n_grams, max(est) AS mx
  FROM cmest GROUP BY id
)
SELECT w.id AS {id_col},
       coalesce(d.n_grams, 0)::BIGINT AS n_grams,
       coalesce(d.mx, 0)::BIGINT AS max_est_freq
FROM cmw w LEFT JOIN cmdoc d ON d.id = w.id
"""
