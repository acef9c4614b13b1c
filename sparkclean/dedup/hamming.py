"""Generic Hamming-ball near-duplicate search over integer fingerprints
(image phash, simhash, any 64/32-bit LSH signature).

Reference intent: the near_duplicate manager's hamming-ball grouping on
perceptual hashes (cleanlab/datalab/internal/issue_manager/duplicate.py:
20-228; SURVEY.md §2.6 maps it to "hamming-ball (near)" on the `phash`
column).

Strategy — blocked candidates + exact popcount verify:

* split the ``bits``-wide fingerprint into ``bits/block_bits``
  contiguous blocks; any pair within Hamming distance
  ``nblocks - 1`` shares at least one block EXACTLY (pigeonhole), so
  an equi-join on (block index, block value) finds every such pair
  with no all-pairs comparison anywhere;
* verify candidates with ``bit_count(xor)`` and keep
  ``<= max_distance``.

Scale knobs:

* ``block_bits`` — expected bucket size grows ~N/2^block_bits; at
  10^12 rows raise it (e.g. 32) to keep buckets ~N/2^32;
* ``n_perms`` — wider blocks lose the pigeonhole guarantee for larger
  radii, so the permuted-table scheme re-blocks ``n_perms`` cyclic
  ROTATIONS of the fingerprint (rotation step coprime with ``bits`` so
  windows sweep all offsets).  Each rotation contributes another
  independent chance for an error-free window; recall on random bit
  flips recovers while bucket sizes stay at N/2^block_bits.  The
  candidate union stays an equi-join (rotation index is part of the
  key), exactly like knn_edges' OR-of-bands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rotation step between permuted tables — coprime with 32 and 64 so
#: successive rotations sweep every bit offset
ROT_STEP = 29


def _check_blocks(bits: int, block_bits: int) -> int:
    if block_bits <= 0 or bits % block_bits != 0:
        raise ValueError(f"block_bits must divide {bits} (got {block_bits})")
    return bits // block_bits


def _rotations(bits: int, n_perms: int) -> list[int]:
    if n_perms < 1:
        raise ValueError("n_perms must be >= 1")
    return [(p * ROT_STEP) % bits for p in range(n_perms)]


def _rot_col(h: Column, r: int, bits: int) -> Column:
    """Cyclic left-rotation of the low ``bits`` of ``h`` (bits=64 uses
    the full long; bits=32 keeps the value in the low half).  Shifts are
    modular in both engines — no ANSI overflow."""
    if r == 0:
        return h
    rot = F.shiftleft(h, r).bitwiseOR(F.shiftrightunsigned(h, bits - r))
    if bits < 64:
        mask = (1 << bits) - 1
        rot = rot.bitwiseAND(F.lit(mask))
    return rot


def _rot_sql(h: str, r: int, bits: int) -> str:
    """Unsigned cyclic rotation in DuckDB.  BIGINT shifts sign-extend
    and raise on overflow, and negative->UBIGINT casts throw — so
    reinterpret two's-complement via HUGEINT & (2^bits - 1), rotate in
    128-bit space (no overflow possible), and mask back."""
    full = (1 << bits) - 1
    hu = f"(({h})::HUGEINT & {full})"
    if r == 0:
        return hu
    return f"((({hu} << {r}) | ({hu} >> {bits - r})) & {full})"


def hamming_block_keys(
    h: Column, bits: int = 64, block_bits: int = 16, n_perms: int = 1
) -> list[Column]:
    """One string key per (rotation, block): ``"p:b:value"``."""
    nblocks = _check_blocks(bits, block_bits)
    mask = (1 << block_bits) - 1
    keys = []
    for p, r in enumerate(_rotations(bits, n_perms)):
        hr = _rot_col(h, r, bits)
        for b in range(nblocks):
            keys.append(
                F.concat_ws(
                    ":",
                    F.lit(f"{p}:{b}"),
                    F.shiftrightunsigned(hr, b * block_bits)
                    .bitwiseAND(F.lit(mask))
                    .cast("string"),
                )
            )
    return keys


def hamming_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_distance: int = 3,
    bits: int = 64,
    block_bits: int = 16,
    n_perms: int = 1,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with popcount distance
    <= ``max_distance``, id_a < id_b, found via blocked equi-join —
    exact (every pair found) whenever
    ``max_distance <= bits/block_bits - 1``; beyond that the rotation
    union makes recall probabilistic (planted-flip recall tests pin the
    configs).  NULL fingerprints (e.g. failed image decodes) are
    excluded — concat_ws would otherwise silently fold them into one
    shared bucket."""
    s = df.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")).where(
        F.col("_h").isNotNull()
    )
    halves = s.select(
        "_id",
        "_h",
        F.explode(
            F.array(*hamming_block_keys(F.col("_h"), bits, block_bits, n_perms))
        ).alias("_key"),
    )
    l = halves.select(F.col("_id").alias("id_a"), F.col("_h").alias("h_a"), "_key")
    r = halves.select(F.col("_id").alias("id_b"), F.col("_h").alias("h_b"), "_key")
    pairs = (
        l.join(r, "_key")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        pairs.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )


def hamming_pairs_sql(
    table: str,
    id_col: str,
    hash_expr: str,
    max_distance: int = 3,
    bits: int = 64,
    block_bits: int = 16,
    n_perms: int = 1,
) -> str:
    """DuckDB twin of :func:`hamming_pairs` (same keys, same verify;
    ``hash_expr`` must evaluate to the identical BIGINT fingerprint)."""
    nblocks = _check_blocks(bits, block_bits)
    mask = (1 << block_bits) - 1
    rows = []
    for p, r in enumerate(_rotations(bits, n_perms)):
        hr = _rot_sql("_h", r, bits)
        for b in range(nblocks):
            rows.append(
                f"  SELECT _id, _h, '{p}:{b}:' || "
                f"((({hr}) >> {b * block_bits}) & {mask})::VARCHAR AS _key FROM hsrc"
            )
    blocks = "\n  UNION ALL\n".join(rows)
    return f"""
WITH hsrc AS MATERIALIZED (SELECT {id_col} AS _id, {hash_expr} AS _h FROM {table}
  WHERE ({hash_expr}) IS NOT NULL),
hkeys AS (
{blocks}
),
hpairs AS (
  SELECT DISTINCT l._id AS id_a, r._id AS id_b, l._h AS h_a, r._h AS h_b
  FROM hkeys l JOIN hkeys r ON l._key = r._key AND l._id < r._id
)
SELECT id_a, id_b, bit_count(xor(h_a, h_b))::INT AS hamming
FROM hpairs WHERE bit_count(xor(h_a, h_b)) <= {max_distance}"""
