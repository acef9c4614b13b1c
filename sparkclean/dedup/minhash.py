"""MinHash + LSH near-duplicate detection, fully Catalyst-native.

Dataflow (shingle → minhash → band → bucket-join → exact-Jaccard verify):

1. word-trigram shingles, distinct, hashed to 60 bits (JVM md5 — exactly
   reproducible in the DuckDB oracle);
2. H=32 minhash signature via universal hashing
   ``(a_i * (s mod 2^31) + b_i) mod P`` (P = 2^61-1; products stay under
   2^63 so ANSI overflow checking never fires);
3. 8 bands × 4 rows; band bucket key = hash60 of the joined band slice;
4. candidate pairs from a self-join on (band, bucket) — the only shuffle
   whose width matters at 100 TB; duplicate clusters are the skew hot
   spot and AQE skew-join splits them;
5. exact Jaccard on the shingle sets filters false positives.

Coefficients are frozen (seeded) and inlined as literals, so the whole
operator is oracle-expressible in DuckDB.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..text.shared import (
    ascii_lower_col,
    ascii_lower_sql,
    hash60_col,
    hash60_sql,
    words_col,
    words_sql,
)

NUM_HASHES = 32
BANDS = 8
ROWS_PER_BAND = NUM_HASHES // BANDS
MERSENNE_P = (1 << 61) - 1
_RNG = np.random.RandomState(1234)
COEF_A = [int(x) for x in _RNG.randint(1, 1 << 31, size=NUM_HASHES)]
COEF_B = [int(x) for x in _RNG.randint(0, 1 << 31, size=NUM_HASHES)]


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Distinct hashed word n-gram shingles from a MATERIALISED words
    column (array<string>).  Callers on the hot path must materialise the
    words array first (``withColumn("_w", words_col(...))``): passing the
    split expression directly re-evaluates the whole tokenisation once per
    shingle under interpreted higher-order functions — O(len²) per doc
    (this cost 12s of a 14s run at sf0.1 before being hoisted)."""
    cnt = F.size(w)
    starts = F.sequence(F.lit(1), cnt - (n - 1))
    grams = F.transform(
        starts,
        lambda i: hash60_col(
            F.concat_ws(" ", *[F.element_at(w, i + off) for off in range(n)])
        ),
    )
    return F.when(cnt >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<bigint>")
    )


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct hashed word n-gram shingles (array<long>).  Convenience
    form for small inputs / oracle parity; hot paths should materialise
    the words column and call :func:`shingles_from_words`."""
    return shingles_from_words(words_col(ascii_lower_col(text)), n)


def shingles_sql(text: str, n: int = 3) -> str:
    w = words_sql(ascii_lower_sql(text))
    gram = " || ' ' || ".join(f"w[i+{off}]" for off in range(n))
    h = hash60_sql(f"({gram})")
    return (
        f"(SELECT CASE WHEN len(w) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len(w) - {n - 2}), i -> {h})) "
        f"ELSE []::BIGINT[] END FROM (SELECT {w} AS w))"
    )


def minhash_signature_col(shingles: Column) -> Column:
    """H-element minhash signature (array<long>); empty set → all P.

    Single fold over the shingle array with an array-of-running-minima
    accumulator — one pass over the data and a plan 32× smaller than
    one aggregate per hash function.
    """
    a_arr = F.array(*[F.lit(a).cast("long") for a in COEF_A])
    b_arr = F.array(*[F.lit(b).cast("long") for b in COEF_B])
    init = F.array_repeat(F.lit(MERSENNE_P).cast("long"), NUM_HASHES)

    def fold(acc: Column, s: Column) -> Column:
        sm = s % F.lit(1 << 31)
        return F.transform(
            acc,
            lambda m, i: F.least(
                m,
                (F.element_at(a_arr, i + 1) * sm + F.element_at(b_arr, i + 1))
                % F.lit(MERSENNE_P),
            ),
        )

    return F.aggregate(shingles, init, fold)


def minhash_signature_sql(shingles: str) -> str:
    parts = [
        (
            f"CASE WHEN len(sh) = 0 THEN {MERSENNE_P} ELSE "
            f"list_min(list_transform(sh, s -> ({a} * (s % {1 << 31}) + {b}) % {MERSENNE_P})) END"
        )
        for a, b in zip(COEF_A, COEF_B)
    ]
    return f"(SELECT [{', '.join(parts)}] FROM (SELECT {shingles} AS sh))"


def band_buckets_col(sig: Column) -> Column:
    """Array of BANDS bucket keys: hash60('band_idx:s1,s2,s3,s4')."""
    keys = []
    for band in range(BANDS):
        lo = band * ROWS_PER_BAND
        parts = [F.element_at(sig, i + 1).cast("string") for i in range(lo, lo + ROWS_PER_BAND)]
        keys.append(hash60_col(F.concat_ws(",", F.lit(str(band)), *parts)))
    return F.array(*keys)


def band_buckets_sql(sig: str) -> str:
    keys = []
    for band in range(BANDS):
        lo = band * ROWS_PER_BAND
        parts = " || ',' || ".join(f"sg[{i + 1}]::VARCHAR" for i in range(lo, lo + ROWS_PER_BAND))
        keys.append(hash60_sql(f"('{band}' || ',' || {parts})"))
    return f"(SELECT [{', '.join(keys)}] FROM (SELECT {sig} AS sg))"


def jaccard_col(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def near_duplicate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """(id_a, id_b, jaccard) for near-duplicate pairs above threshold.

    Scale shape: the LSH band self-join carries ONLY (id, bucket) — the
    multi-hundred-element shingle arrays never enter the candidate
    shuffle or the pair dedup; they are joined back just for the final
    (tiny) candidate set's exact-Jaccard check.  At 100 TB the band join
    shuffles ~16 bytes/row/band instead of ~2 KB/row/band."""
    from ..skew import ensure_parallelism

    # Filter on the word count, NOT on size(_sh) > 0: an equivalent
    # predicate on the shingle array gets pushed below the exchange and
    # re-inlines the whole O(len^2) shingle expression over raw text.
    # NOTE on the apparent triple shingle computation: `base` appears in
    # three plan subtrees (bucket path + the two verify join-backs), but
    # the a/b sides are IDENTICAL exchanges and Spark's ReuseExchange
    # deduplicates them at execution — measured: an "optimized" rewrite
    # that persisted the small bucket frame and re-shingled only
    # candidate rows ran 1.5-1.8x SLOWER at sf0.1 (extra distinct +
    # semi-join + cache round-trips outweigh the reused shingle pass).
    # Keep the declarative form and let the optimizer share the subtree.
    base = (
        ensure_parallelism(df)
        .withColumn("_w", words_col(ascii_lower_col(F.col(text_col))))
        .where(F.size("_w") >= 3)
        .select(F.col(id_col).alias("_id"), shingles_from_words(F.col("_w")).alias("_sh"))
    )
    sig = base.withColumn("_sig", minhash_signature_col(F.col("_sh")))
    buckets = sig.select(
        "_id", F.explode(band_buckets_col(F.col("_sig"))).alias("_bucket")
    )
    cand = (
        buckets.select(F.col("_id").alias("id_a"), "_bucket")
        .join(buckets.select(F.col("_id").alias("id_b"), "_bucket"), "_bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = base.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = base.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jaccard_col(F.col("_sh_a"), F.col("_sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def near_duplicate_pairs_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.8
) -> str:
    sh = shingles_sql(text_col)
    sig = minhash_signature_sql("_sh")
    bk = band_buckets_sql("_sig")
    return f"""
WITH base AS (
  SELECT {id_col} AS _id, {sh} AS _sh FROM {table}
), nonempty AS (
  SELECT _id, _sh, {sig} AS _sig FROM base WHERE len(_sh) > 0
), buckets AS (
  SELECT _id, _sh, unnest({bk}) AS _bucket FROM nonempty
), pairs AS (
  SELECT DISTINCT l._id AS id_a, r._id AS id_b
  FROM buckets l JOIN buckets r ON l._bucket = r._bucket AND l._id < r._id
), scored AS (
  SELECT p.id_a, p.id_b,
         CASE WHEN len(list_distinct(a._sh || b._sh)) > 0 THEN
           len(list_intersect(a._sh, b._sh))::DOUBLE / len(list_distinct(a._sh || b._sh))
         ELSE 0.0 END AS jaccard
  FROM pairs p
  JOIN (SELECT DISTINCT _id, _sh FROM nonempty) a ON p.id_a = a._id
  JOIN (SELECT DISTINCT _id, _sh FROM nonempty) b ON p.id_b = b._id
)
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM scored WHERE jaccard >= {threshold}
"""


def near_duplicate_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_iter: int = 20,
) -> DataFrame:
    """Near-duplicate text CLUSTERS — connected components over the
    verified :func:`near_duplicate_pairs` graph (the keep-one-per-cluster
    shape: ``WHERE {id} = cluster_rep`` after this).  Returns
    ``(id, cluster_rep, cluster_size)`` for every input row; singletons
    keep themselves at size 1.  Shares the pointer-jumping component
    primitive with the hamming/phash path
    (:func:`sparkclean.graph.components_from_pairs`)."""
    from ..graph import components_from_pairs

    pairs = near_duplicate_pairs(df, text_col, id_col, threshold)
    out = components_from_pairs(
        pairs, df.select(F.col(id_col).alias("id")), max_iter=max_iter
    )
    return out.withColumnRenamed("id", id_col)


def near_duplicate_clusters_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.8
) -> str:
    """DuckDB twin of :func:`near_duplicate_clusters` — the pair query
    nests as a CTE body under the shared recursive-components wrapper."""
    from ..graph import components_sql

    return components_sql(
        near_duplicate_pairs_sql(table, text_col, id_col, threshold), table, id_col
    )


def near_duplicate_best_representatives(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_iter: int = 20,
) -> DataFrame:
    """Keep-BEST-per-cluster dedup policy: (id, cluster_rep,
    cluster_size, quality, keep) where ``keep`` marks each cluster's
    highest-quality member (production dedup keeps the best document,
    not the lowest id).  Quality is the documented composite
    ``alpha_ratio - repetition_ratio`` (more alphabetic, less repeated
    — sparkclean.text.rules exprs; swap for a model score in
    production); ties break on id ASC; quality is compared unrounded
    and reported 6dp-rounded.

    Scale shape: the verified component loop plus one id-equi join of
    the quality projection and one (cluster_rep)-keyed argmin agg +
    join back — the argmin is ``min(struct(-quality, id))``, a
    map-side-combinable aggregate (no per-cluster window)."""
    from ..text.rules import alpha_ratio_col, repetition_ratio_col

    t = F.coalesce(F.col(text_col), F.lit(""))
    quality = (alpha_ratio_col(t) - repetition_ratio_col(t)).alias("_q")
    clusters = near_duplicate_clusters(df, text_col, id_col, threshold, max_iter)
    scored = clusters.join(df.select(id_col, quality), id_col)
    best = scored.groupBy("cluster_rep").agg(
        F.min(
            F.struct((-F.col("_q")).alias("nq"), F.col(id_col).alias("bid"))
        ).alias("_b")
    )
    return scored.join(best, "cluster_rep").select(
        id_col,
        "cluster_rep",
        "cluster_size",
        F.round("_q", 6).alias("quality"),
        (F.col(id_col) == F.col("_b.bid")).alias("keep"),
    )


def near_duplicate_best_representatives_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> str:
    """DuckDB twin of :func:`near_duplicate_best_representatives`."""
    from ..text.rules import quality_features_sql_exprs

    ex = quality_features_sql_exprs(f"coalesce({text_col}, '')")
    return f"""
WITH nbr_clusters AS MATERIALIZED (
{near_duplicate_clusters_sql(table, text_col, id_col, threshold)}
), nbr_scored AS MATERIALIZED (
  SELECT c.{id_col}, c.cluster_rep, c.cluster_size,
         ({ex["alpha_ratio"]}) - ({ex["repetition_ratio"]}) AS q
  FROM nbr_clusters c JOIN {table} d ON d.{id_col} = c.{id_col}
), nbr_ranked AS (
  SELECT {id_col}, cluster_rep, cluster_size, q,
         row_number() OVER (
             PARTITION BY cluster_rep ORDER BY q DESC, {id_col} ASC
         ) AS rn
  FROM nbr_scored
)
SELECT {id_col}, cluster_rep, cluster_size,
       round(q, 6) AS quality, rn = 1 AS keep
FROM nbr_ranked
"""
