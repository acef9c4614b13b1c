"""Generic Hamming-ball near-duplicate search over integer fingerprints
(image phash, simhash, any 64/32-bit LSH signature).

Reference intent: the near_duplicate manager's hamming-ball grouping on
perceptual hashes (cleanlab/datalab/internal/issue_manager/duplicate.py:
20-228; SURVEY.md §2.6 maps it to "hamming-ball (near)" on the `phash`
column).

Strategy — distinct-fingerprint collapse + blocked candidates + exact
popcount verify:

* **collapse exact-duplicate fingerprints first** (``groupBy(hash)`` →
  min-id representative).  This is the hot-key guard: a mega-cluster of
  m identical fingerprints (blank / solid-color images are common at
  corpus scale) is ONE row in the band join instead of m rows that
  would meet themselves in every block bucket and emit O(m²) candidate
  pairs.  The reference applies the same correction — exact-duplicate
  sets are collapsed before the neighbor graph
  (/root/reference/cleanlab/internal/neighbor/knn_graph.py:492-566) —
  and winnowing's max_df stop-fingerprint anti-join
  (sparkclean/text/winnow.py) is the in-repo precedent.  Consequence
  for the pair contract: :func:`hamming_pairs` reports pairs between
  DISTINCT fingerprints only (so every reported distance is >= 1),
  identified by their group representatives; distance-0 "pairs" are
  exact duplicates and belong to ``dedup.exact`` /
  :func:`hamming_clusters`, which expands full membership linearly;
* split the ``bits``-wide fingerprint into ``bits/block_bits``
  contiguous blocks; any pair within Hamming distance
  ``nblocks - 1`` shares at least one block EXACTLY (pigeonhole), so
  an equi-join on (block index, block value) finds every such pair
  with no all-pairs comparison anywhere;
* verify candidates with ``bit_count(xor)`` and keep
  ``<= max_distance``.

Scale knobs:

* ``block_bits`` — expected bucket size grows ~D/2^block_bits (D =
  DISTINCT fingerprints after the collapse); at 10^12 rows raise it
  (e.g. 32) to keep buckets ~D/2^32;
* ``n_perms`` — wider blocks lose the pigeonhole guarantee for larger
  radii, so the permuted-table scheme re-blocks ``n_perms`` cyclic
  ROTATIONS of the fingerprint (rotation step coprime with ``bits`` so
  windows sweep all offsets).  Each rotation contributes another
  independent chance for an error-free window; recall on random bit
  flips recovers while bucket sizes stay at D/2^block_bits.  The
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


def _fingerprint_groups(df: DataFrame, id_col: str, hash_col: str) -> DataFrame:
    """One row per DISTINCT non-null fingerprint: ``(_h, _rep)`` with
    ``_rep`` = min id of the exact-duplicate group.  NULL fingerprints
    (e.g. failed image decodes) are excluded — concat_ws in the block
    keys would otherwise silently fold them into one shared bucket.

    Built identically by :func:`hamming_pairs` and
    :func:`hamming_clusters` so the groupBy exchange is deduplicated by
    ReuseExchange when both appear in one plan (round-3 lesson: measure
    before persisting shared subtrees)."""
    return (
        df.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"))
        .where(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(F.min("_id").alias("_rep"))
    )


def _rep_pairs(
    groups: DataFrame,
    max_distance: int,
    bits: int,
    block_bits: int,
    n_perms: int,
) -> DataFrame:
    """Verified representative-level pairs from a ``(_h, _rep)`` distinct
    fingerprint frame."""
    halves = groups.select(
        "_rep",
        "_h",
        F.explode(
            F.array(*hamming_block_keys(F.col("_h"), bits, block_bits, n_perms))
        ).alias("_key"),
    )
    l = halves.select(F.col("_rep").alias("id_a"), F.col("_h").alias("h_a"), "_key")
    r = halves.select(F.col("_rep").alias("id_b"), F.col("_h").alias("h_b"), "_key")
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


def hamming_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_distance: int = 3,
    bits: int = 64,
    block_bits: int = 16,
    n_perms: int = 1,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs of DISTINCT fingerprints with popcount
    distance <= ``max_distance``, id_a < id_b, found via blocked
    equi-join — exact (every distinct-fingerprint pair found) whenever
    ``max_distance <= bits/block_bits - 1``; beyond that the rotation
    union makes recall probabilistic (planted-flip recall tests pin the
    configs).

    Exact-duplicate fingerprints are collapsed to their min-id
    representative BEFORE banding (see module docstring): a group of m
    identical fingerprints contributes one band row and zero output
    pairs, not O(m²) of each — so every reported ``hamming`` is >= 1 and
    both the candidate volume and the output are linear in the distinct
    fingerprint count.  Full duplicate-group membership (including
    distance-0 members) is :func:`hamming_clusters`' job."""
    groups = _fingerprint_groups(df, id_col, hash_col)
    return _rep_pairs(groups, max_distance, bits, block_bits, n_perms)


def _pairs_ctes(
    table: str,
    id_col: str,
    hash_expr: str,
    max_distance: int,
    bits: int,
    block_bits: int,
    n_perms: int,
) -> str:
    """Shared CTE chain ending in ``vpairs(id_a, id_b, hamming)`` — the
    verified representative-level pair set both
    :func:`hamming_pairs_sql` and :func:`hamming_clusters_sql` select
    from.  ``hgrp`` is the distinct-fingerprint collapse (one row per
    hash, min-id representative) mirroring :func:`_fingerprint_groups`."""
    nblocks = _check_blocks(bits, block_bits)
    mask = (1 << block_bits) - 1
    rows = []
    for p, r in enumerate(_rotations(bits, n_perms)):
        hr = _rot_sql("_h", r, bits)
        for b in range(nblocks):
            rows.append(
                f"  SELECT _rep, _h, '{p}:{b}:' || "
                f"((({hr}) >> {b * block_bits}) & {mask})::VARCHAR AS _key FROM hgrp"
            )
    blocks = "\n  UNION ALL\n".join(rows)
    return f"""hsrc AS MATERIALIZED (SELECT {id_col} AS _id, {hash_expr} AS _h FROM {table}
  WHERE ({hash_expr}) IS NOT NULL),
hgrp AS MATERIALIZED (SELECT _h, min(_id) AS _rep FROM hsrc GROUP BY _h),
hkeys AS (
{blocks}
),
hpairs AS (
  SELECT DISTINCT l._rep AS id_a, r._rep AS id_b, l._h AS h_a, r._h AS h_b
  FROM hkeys l JOIN hkeys r ON l._key = r._key AND l._rep < r._rep
),
vpairs AS MATERIALIZED (
  SELECT id_a, id_b, bit_count(xor(h_a, h_b))::INT AS hamming
  FROM hpairs WHERE bit_count(xor(h_a, h_b)) <= {max_distance}
)"""


def hamming_pairs_sql(
    table: str,
    id_col: str,
    hash_expr: str,
    max_distance: int = 3,
    bits: int = 64,
    block_bits: int = 16,
    n_perms: int = 1,
) -> str:
    """DuckDB twin of :func:`hamming_pairs` (same collapse, same keys,
    same verify; ``hash_expr`` must evaluate to the identical BIGINT
    fingerprint)."""
    ctes = _pairs_ctes(table, id_col, hash_expr, max_distance, bits, block_bits, n_perms)
    return f"""
WITH {ctes}
SELECT id_a, id_b, hamming FROM vpairs"""


def hamming_clusters(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_distance: int = 3,
    bits: int = 64,
    block_bits: int = 16,
    n_perms: int = 1,
    max_iter: int = 20,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    :func:`hamming_pairs` graph — the "keep one representative per
    near-dup cluster" shape a training pipeline actually applies
    (``WHERE id = cluster_rep`` after this).  Returns
    ``(id, cluster_rep, cluster_size)`` for every input row; singletons
    (including NULL-fingerprint rows) keep themselves (size 1).

    Components resolve at the DISTINCT-fingerprint level (min-label
    propagation + pointer jumping over group representatives,
    :func:`sparkclean.graph.component_labels`), then every row joins its
    representative's component through one linear membership join — a
    mega-cluster of m identical fingerprints costs m membership rows,
    never m² pairs.  Cluster semantics are unchanged from the
    pre-collapse implementation: identical fingerprints are distance-0
    neighbours, so an exact-duplicate group always lands in one cluster."""
    from ..graph import component_labels

    groups = _fingerprint_groups(df, id_col, hash_col)
    pairs = _rep_pairs(groups, max_distance, bits, block_bits, n_perms)
    labels = component_labels(pairs, max_iter=max_iter).select(
        F.col("id").alias("_rep"), "comp"
    )
    # member is the SMALL (id, cluster_rep) scalar result; checkpoint it
    # eagerly because it is consumed twice below (sizes agg + final
    # join) and its lineage re-evaluates ``df`` — which for the image
    # pipeline is the decode stage; without the cut each consumer would
    # re-decode the corpus (same fix as minhash's membership, measured
    # 31.6s -> 1.0s there)
    member = (
        df.select(F.col(id_col).alias("_mid"), F.col(hash_col).alias("_h"))
        .join(groups, "_h", "left")
        .join(labels, "_rep", "left")
        .select(
            F.col("_mid").alias("id"),
            F.coalesce("comp", "_rep", "_mid").alias("cluster_rep"),
        )
        .localCheckpoint(eager=True)
    )
    sizes = member.groupBy("cluster_rep").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        member.join(sizes, "cluster_rep")
        .select("id", "cluster_rep", "cluster_size")
        .withColumnRenamed("id", id_col)
    )


def hamming_clusters_sql(
    table: str,
    id_col: str,
    hash_expr: str,
    max_distance: int = 3,
    bits: int = 64,
    block_bits: int = 16,
    n_perms: int = 1,
) -> str:
    """DuckDB twin of :func:`hamming_clusters`: recursive reachability
    over the same verified representative pair set, component label =
    min reaching id (fine at oracle scale; the Spark side
    pointer-jumps), membership expanded through the hgrp collapse."""
    ctes = _pairs_ctes(table, id_col, hash_expr, max_distance, bits, block_bits, n_perms)
    return f"""
WITH RECURSIVE {ctes},
hedges AS (
  SELECT id_a AS src, id_b AS dst FROM vpairs
  UNION
  SELECT id_b, id_a FROM vpairs
),
hreach AS (
  SELECT src AS id, src AS comp FROM hedges
  UNION
  SELECT e.dst AS id, r.comp FROM hreach r JOIN hedges e ON e.src = r.id
),
hcomp AS (SELECT id, min(comp) AS comp FROM hreach GROUP BY id),
hmem AS (SELECT s._id AS id, g._rep FROM hsrc s JOIN hgrp g USING (_h)),
hall AS (SELECT {id_col} AS id FROM {table}),
hasg AS (
  SELECT a.id, coalesce(c.comp, m._rep, a.id) AS cluster_rep
  FROM hall a
  LEFT JOIN hmem m USING (id)
  LEFT JOIN hcomp c ON c.id = m._rep
),
hsizes AS (SELECT cluster_rep, count(*) AS cluster_size FROM hasg GROUP BY 1)
SELECT id AS {id_col}, cluster_rep, cluster_size
FROM hasg JOIN hsizes USING (cluster_rep)"""
