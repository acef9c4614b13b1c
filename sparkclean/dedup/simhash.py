"""32-bit SimHash document fingerprints — Catalyst-native with SQL twin.

simhash(doc) = Σ_j 2^j · [ Σ_{t ∈ distinct tokens} (bit_j(hash60(t)) ? +1 : -1) > 0 ]

Near-dup candidates share 16-bit halves (two-block Hamming banding):
any pair within Hamming distance 1 shares at least one half exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..text.shared import hash60_col, hash60_sql, words_col, words_sql

BITS = 32


def token_hashes_col(text: Column) -> Column:
    w = F.array_distinct(words_col(F.lower(text)))
    return F.transform(w, lambda t: hash60_col(t))


def _bit_vote(j: int):
    def fold(acc: Column, h: Column) -> Column:
        return acc + F.when(F.shiftright(h, j) % 2 == 1, F.lit(1)).otherwise(F.lit(-1))

    return fold


def simhash_from_hashes(hs: Column) -> Column:
    """Simhash from a MATERIALISED token-hash column (array<long>).  The 32
    per-bit folds each re-evaluate their input expression, so callers must
    hoist the tokenisation into its own column first — otherwise the text
    is split+hashed 32x per row."""
    out = F.lit(0).cast("long")
    # shiftright needs a Python-int bit count, so unroll the 32 bit votes
    # into one wide projection (still a single codegen stage).
    for j in range(BITS):
        vote = F.aggregate(hs, F.lit(0).cast("long"), _bit_vote(j))
        out = out + F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_col(text: Column) -> Column:
    """Convenience form for small inputs / oracle parity; hot paths go
    through :func:`with_simhash`, which materialises the token hashes."""
    return simhash_from_hashes(token_hashes_col(text))


def simhash_from_hashes_udf():
    """Arrow-vectorized simhash over a materialised token-hash column.

    The bit votes are INTEGER sums (Σ ±1), so unlike the float kernels
    no accumulation-order discipline is needed — bincount over the
    exploded hash array is exact and ~100x the 32-fold interpreted
    projection.  Empty token lists yield simhash 0, matching the fold."""

    @pandas_udf("long")
    def simhash(hs: pd.Series) -> pd.Series:
        n = len(hs)
        lens = np.fromiter((len(x) for x in hs), dtype=np.int64, count=n)
        if lens.sum() == 0:
            return pd.Series(np.zeros(n, dtype=np.int64))
        flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in hs if len(x)])
        rowids = np.repeat(np.arange(n), lens)
        out = np.zeros(n, dtype=np.int64)
        for j in range(BITS):
            ones = np.bincount(rowids, weights=(flat >> j) & 1, minlength=n)
            votes = 2 * ones - lens
            out += (votes > 0).astype(np.int64) << j
        return pd.Series(out)

    return simhash


def simhash_sql(text: str) -> str:
    w = words_sql(f"lower({text})")
    h = hash60_sql("t")
    # outer CAST: DuckDB widens the BIGINT list-sum to HUGEINT, which
    # pandas renders as float64 — the driver hash then diverges from
    # Spark's int64 even though values match.
    return (
        f"(SELECT CAST(list_aggregate(list_transform(range(0, {BITS}), j -> "
        f"CASE WHEN list_aggregate(list_transform(hs, x -> "
        f"CASE WHEN (x >> j) % 2 = 1 THEN 1 ELSE -1 END), 'sum') > 0 "
        f"THEN (1::BIGINT << j) ELSE 0::BIGINT END), 'sum') AS BIGINT) "
        f"FROM (SELECT list_transform(list_distinct({w}), t -> {h}) AS hs))"
    )


def with_simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    return (
        df.withColumn("_hs", token_hashes_col(F.col(text_col)))
        .withColumn(out_col, simhash_from_hashes_udf()(F.col("_hs")))
        .drop("_hs")
    )


def simhash_candidate_pairs_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> str:
    """DuckDB twin of :func:`simhash_candidate_pairs` (same 16-bit half
    blocking, same popcount verify)."""
    sh = simhash_sql(text_col)
    return f"""
WITH sh AS MATERIALIZED (SELECT {id_col} AS _id, {sh} AS _sh FROM {table}),
halves AS (
  SELECT _id, _sh, 'lo:' || (_sh % 65536)::VARCHAR AS _half FROM sh
  UNION ALL
  SELECT _id, _sh, 'hi:' || (_sh // 65536)::VARCHAR AS _half FROM sh
),
pairs AS (
  SELECT DISTINCT l._id AS id_a, r._id AS id_b, l._sh AS sh_a, r._sh AS sh_b
  FROM halves l JOIN halves r ON l._half = r._half AND l._id < r._id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::INT AS hamming
FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}"""


def simhash_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Candidate near-dup pairs sharing a 16-bit simhash half, verified by
    exact popcount Hamming distance <= max_hamming."""
    s = with_simhash(
        df.select(F.col(id_col).alias("_id"), text_col), text_col, "_sh"
    ).select("_id", "_sh")
    halves = s.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                F.concat_ws(":", F.lit("lo"), (F.col("_sh") % F.lit(1 << 16)).cast("string")),
                F.concat_ws(":", F.lit("hi"), F.shiftright(F.col("_sh"), 16).cast("string")),
            )
        ).alias("_half"),
    )
    l = halves.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), "_half")
    r = halves.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), "_half")
    pairs = (
        l.join(r, "_half")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", ham).where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
