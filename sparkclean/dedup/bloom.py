"""Deterministic Bloom-filter membership — the compact-broadcast
alternative to semi-joins for corpus-scale dedup/decontamination.

At 10^12 documents the exact decontamination semi-join
(text/contamination.py) broadcasts the full benchmark n-gram hash set;
when that set grows past broadcast size the published recipe switches
to a Bloom filter (Dolma uses exactly this for corpus-wide paragraph
dedup; Bloom 1970 is the primitive).  This module builds the filter
DETERMINISTICALLY from the shared 60-bit gram hashes with double
hashing (Kirsch-Mitzenmacher 2006: pos_i = (h1 + i·h2) mod m), all in
exact integer arithmetic — so Spark, DuckDB and NumPy construct
bit-identical filters and even the FALSE POSITIVES agree hash-exactly
across engines (the DuckDB twin needs no bit array at all: membership
in the bit array ⟺ all k positions appear in the position set).

Position schedule (m = 2^m_bits, h = the nonnegative 60-bit gram hash):

* ``h1 = h mod m``
* ``h2 = ((h div 2^20) mod m) · 2 + 1``  (odd ⇒ full cycle for m = 2^b)
* ``pos_i = (h1 + i · h2) mod m``, i = 0..k−1

Scale shape: the filter is built with one distinct aggregate over the
benchmark side (positions ≤ min(k·|bench|, m) rows — bounded by m, a
CONFIG knob, not the data) collected once and closed over by an Arrow
membership kernel; the corpus is scanned exactly once with zero joins
and zero shuffles on the membership pass (only the per-doc stats
projection).  Compare: the exact route shuffles matched rows; the
bloom route shuffles nothing.

False-positive rate: classic (1 − e^{−kn/m})^k — with the default
m = 2^16, k = 3 and a few thousand benchmark grams this is < 1e-4;
callers size m_bits to their benchmark.  ``flagged`` is a SUPERSET of
the exact ``contaminated`` flag (asserted in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..text.contamination import _with_gram_hashes

M_BITS_DEFAULT = 16
K_DEFAULT = 3
_H2_SHIFT = 1 << 20


def bloom_positions_np(gh: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) int64 position matrix for nonnegative 60-bit hashes."""
    m = np.int64(1) << m_bits
    h1 = gh % m
    h2 = ((gh // _H2_SHIFT) % m) * 2 + 1
    return np.stack([(h1 + i * h2) % m for i in range(k)])


def build_bloom_words(positions: np.ndarray, m_bits: int) -> np.ndarray:
    """uint64 bit-array words from set positions."""
    words = np.zeros(((1 << m_bits) + 63) // 64, dtype=np.uint64)
    p = np.unique(positions.astype(np.int64).ravel())
    np.bitwise_or.at(words, p >> 6, np.uint64(1) << (p & 63).astype(np.uint64))
    return words


def _bench_positions(
    bench_df: DataFrame, n: int, m_bits: int, k: int, text_col: str
) -> DataFrame:
    """Distinct bloom positions of the benchmark's gram hashes — at most
    min(k·|bench grams|, 2^m_bits) rows (bounded by config, not data)."""
    m = 1 << m_bits
    ghs = (
        _with_gram_hashes(bench_df, text_col, n, "_bl_g")
        .select(F.explode_outer("_bl_g").alias("_bl_h"))
        .where(F.col("_bl_h").isNotNull())
    )
    h1 = F.col("_bl_h") % m
    h2 = (F.shiftright(F.col("_bl_h"), 20) % m) * 2 + 1
    pos = F.array(*[(h1 + i * h2) % m for i in range(k)])
    return (
        ghs.select(F.explode(pos).alias("p")).distinct()
    )


def bloom_contamination(
    df: DataFrame,
    bench_df: DataFrame,
    n: int = 8,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """(id, n_ngrams, n_flagged, flagged) for EVERY row of ``df`` —
    the Bloom-filter analogue of :func:`sparkclean.text.contamination
    .ngram_contamination`; ``flagged`` is a deterministic superset of
    the exact ``contaminated`` (false positives only, never negatives).

    The filter is collected once (≤ 2^m_bits/8 bytes) and closed over
    by the Arrow membership kernel; the corpus-side plan has no join
    and no shuffle."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not 6 <= m_bits <= 30:
        raise ValueError(f"m_bits must be in [6, 30], got {m_bits}")
    bench_text_col = bench_text_col or text_col
    pos_rows = _bench_positions(bench_df, n, m_bits, k, bench_text_col).collect()
    words = build_bloom_words(
        np.array([r["p"] for r in pos_rows], dtype=np.int64), m_bits
    )
    return with_bloom_flags(
        df, words, n=n, m_bits=m_bits, k=k, text_col=text_col, id_col=id_col
    )


def with_bloom_flags(
    df: DataFrame,
    words: np.ndarray,
    n: int,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Membership pass against a PREBUILT filter — a stateless Arrow
    projection, so it applies unchanged to a Structured Streaming
    DataFrame (the filter is a closure constant; build it batch-side
    with :func:`build_bloom_words`, then flag the stream)."""

    @pandas_udf("long")
    def _count_members(ghs: pd.Series) -> pd.Series:
        lens = np.fromiter(
            (len(x) for x in ghs), dtype=np.int64, count=len(ghs)
        )
        total = int(lens.sum())
        if total == 0:
            return pd.Series(np.zeros(len(ghs), dtype=np.int64))
        flat = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in ghs if len(x)]
        )
        pos = bloom_positions_np(flat, m_bits, k)
        member = np.ones(total, dtype=bool)
        for i in range(k):
            p = pos[i]
            member &= (
                (words[p >> 6] >> (p & 63).astype(np.uint64))
                & np.uint64(1)
            ).astype(bool)
        cs = np.concatenate([[0], np.cumsum(member.astype(np.int64))])
        idx = np.concatenate([[0], np.cumsum(lens)])
        return pd.Series(cs[idx[1:]] - cs[idx[:-1]])

    docs = _with_gram_hashes(df, text_col, n, "_bl_g")
    return docs.select(
        id_col,
        F.size("_bl_g").cast("long").alias("n_ngrams"),
        _count_members(F.col("_bl_g")).alias("n_flagged"),
    ).withColumn("flagged", F.col("n_flagged") > 0)


def bloom_member_col(
    gh: Column, words: np.ndarray, m_bits: int, k: int
) -> Column:
    """Catalyst membership predicate for a 60-bit hash column against a
    built filter — the small-data twin of the Arrow kernel (the word
    list rides ONE array literal; each check is k O(1) element_at bit
    probes).  Signed reinterpretation of the uint64 words is safe:
    arithmetic shift preserves every bit below 63 and the mask is &1."""
    m = 1 << m_bits
    signed = [int(w) - (1 << 64) if w >= (1 << 63) else int(w) for w in words]
    warr = F.lit(signed)
    h1 = gh % m
    # shiftright, NOT division: double division loses exactness past
    # 2^53 and DIV needs a named column; gh is nonnegative so the
    # arithmetic shift equals the integer division by 2^20
    h2 = (F.shiftright(gh, 20) % m) * 2 + 1
    pred = F.lit(True)
    for i in range(k):
        p = (h1 + i * h2) % m
        word = F.element_at(warr, (F.shiftright(p, 6) + 1).cast("int"))
        # python F.shiftright only takes an int literal shift — the SQL
        # registry form accepts a column shift amount
        bit = F.call_function("shiftright", word, (p % 64).cast("int"))
        pred = pred & (bit.bitwiseAND(F.lit(1)) == 1)
    return pred


def bloom_contamination_sql(
    table: str,
    bench_where: str,
    n: int = 8,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bloom_contamination`.  No bit array:
    bloom membership ⟺ all k double-hash positions occur in the
    benchmark position set, so the twin counts matched positions per
    gram and requires k of k."""
    from ..text.shared import hash60_sql, words_sql

    m = 1 << m_bits
    gram_expr = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    pos_exprs = ", ".join(
        f"(h1 + {i} * h2) % {m}" for i in range(k)
    )
    return f"""
WITH blw AS MATERIALIZED (
  SELECT {id_col} AS id, ({bench_where}) AS is_bench,
         {words_sql(f"coalesce({text_col}, '')")} AS w
  FROM {table}
), blgrams AS MATERIALIZED (
  SELECT id, is_bench,
         list_distinct(list_transform(
             range(1, greatest(len(w) - {n - 1}, 0) + 1),
             i -> {hash60_sql(f"({gram_expr})")}
         )) AS gset
  FROM blw
), blhash AS MATERIALIZED (
  SELECT id, is_bench, h, h % {m} AS h1, ((h // {_H2_SHIFT}) % {m}) * 2 + 1 AS h2
  FROM blgrams, unnest(gset) t(h)
), blpos AS MATERIALIZED (
  SELECT DISTINCT p
  FROM blhash, unnest([{pos_exprs}]) u(p)
  WHERE is_bench
), bldocpos AS (
  SELECT id, h, p
  FROM blhash, unnest([{pos_exprs}]) u(p)
), blmember AS (
  -- all k probe OCCURRENCES hit <=> bloom membership (duplicate probe
  -- positions each match independently, so a plain count works)
  SELECT d.id, d.h
  FROM bldocpos d JOIN blpos USING (p)
  GROUP BY d.id, d.h
  HAVING count(*) = {k}
), blcounts AS (
  SELECT id, count(*) AS nf
  FROM blmember GROUP BY id
)
SELECT g.id AS {id_col},
       len(g.gset)::BIGINT AS n_ngrams,
       coalesce(c.nf, 0)::BIGINT AS n_flagged,
       coalesce(c.nf, 0) > 0 AS flagged
FROM blgrams g LEFT JOIN blcounts c ON c.id = g.id
"""
