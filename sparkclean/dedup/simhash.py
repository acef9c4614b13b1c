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
    projection.  Empty AND NULL token lists both yield simhash 0 —
    matching the Catalyst fold exactly: each bit contributes
    ``when(vote > 0, bit).otherwise(0)``, and a NULL vote (aggregate
    over a NULL array) falls into the otherwise-0 branch, as does the
    SQL twin's ``CASE WHEN NULL > 0 … ELSE 0``.  Null-text corpora thus
    behave identically on the fast and oracle paths instead of raising
    TypeError on len(None)."""

    @pandas_udf("long")
    def simhash(hs: pd.Series) -> pd.Series:
        n = len(hs)
        lens = np.fromiter(
            (0 if x is None else len(x) for x in hs), dtype=np.int64, count=n
        )
        out = np.zeros(n, dtype=np.int64)
        if lens.sum() > 0:
            flat = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in hs if x is not None and len(x)]
            )
            rowids = np.repeat(np.arange(n), lens)
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


def _check_block_bits(block_bits: int) -> int:
    if block_bits <= 0 or BITS % block_bits != 0:
        raise ValueError(
            f"block_bits must divide {BITS} (got {block_bits})"
        )
    return BITS // block_bits


def simhash_candidate_pairs_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    block_bits: int = 16,
) -> str:
    """DuckDB twin of :func:`simhash_candidate_pairs` (same block-key
    blocking, same popcount verify)."""
    nblocks = _check_block_bits(block_bits)
    mask = (1 << block_bits) - 1
    sh = simhash_sql(text_col)
    blocks = "\n  UNION ALL\n".join(
        f"  SELECT _id, _sh, '{b}:' || (((_sh >> {b * block_bits}) & {mask}))::VARCHAR AS _half FROM sh"
        for b in range(nblocks)
    )
    return f"""
WITH sh AS MATERIALIZED (SELECT {id_col} AS _id, {sh} AS _sh FROM {table}),
halves AS (
{blocks}
),
pairs AS (
  SELECT DISTINCT l._id AS id_a, r._id AS id_b, l._sh AS sh_a, r._sh AS sh_b
  FROM halves l JOIN halves r ON l._half = r._half AND l._id < r._id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::INT AS hamming
FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}"""


def simhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    block_bits: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs sharing a ``block_bits``-wide simhash
    block, verified by exact popcount Hamming distance <= max_hamming.

    ``block_bits`` is the scale knob (the simhash analog of knn_edges'
    EDGE_BITS): expected bucket size grows ~N/2^block_bits, so at 10^12
    rows keep block_bits=16 but RAISE the block count by LOWERING
    block_bits only when recall for larger Hamming radii matters — by
    pigeonhole, d <= nblocks-1 pairs are guaranteed to share a block
    (2 blocks of 16 guarantee d<=1; 4 blocks of 8 guarantee d<=3).  The
    complementary growth path for huge corpora is the permuted-table
    scheme (rotate the fingerprint by block_bits and re-block), which
    keeps bucket sizes at N/2^16 while restoring multi-block recall;
    plumb it as extra explode keys here if needed."""
    nblocks = _check_block_bits(block_bits)
    mask = (1 << block_bits) - 1
    s = with_simhash(
        df.select(F.col(id_col).alias("_id"), text_col), text_col, "_sh"
    ).select("_id", "_sh")
    halves = s.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(b)),
                        (
                            F.shiftright(F.col("_sh"), b * block_bits)
                            .bitwiseAND(F.lit(mask))
                        ).cast("string"),
                    )
                    for b in range(nblocks)
                ]
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
