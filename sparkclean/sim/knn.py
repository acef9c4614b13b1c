"""Similarity search over embedding columns.

* :func:`cosine_topk` — exact brute-force top-k for a (small, broadcast)
  query set: the correctness baseline, one shuffle-free broadcast join +
  per-query window.
* :func:`lsh_topk` — sign-random-projection bucketed variant: candidates
  share an LSH signature prefix, so the join is an equi-join on the
  bucket key instead of a cross join — the 100 TB scale path.  Frozen
  seeded hyperplanes, inlined as literals.
* :func:`embedding_near_duplicates` — cosine ≥ threshold pairs within a
  blocking key (label), the embedding analog of phash-cluster dedup.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_sql(a: str, b: str) -> str:
    dot = f"list_aggregate(list_transform(range(1, len({a})+1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), 'sum')"
    na = f"sqrt(list_aggregate(list_transform({a}, x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    nb = f"sqrt(list_aggregate(list_transform({b}, x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    return f"({dot} / ({na} * {nb}))"


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours of each query row (excluding self).

    The query side is broadcast — the scan side streams once with no
    shuffle; ranking shuffles only (num_queries × N_candidates-in-topk)
    via the per-query window.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    joined = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = joined.withColumn("cosine", cosine_col(F.col("_qvec"), F.col("_cvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def cosine_topk_sql(
    table: str,
    query_pred: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    cos = cosine_sql("q._qvec", "c._cvec")
    return f"""
WITH q AS (SELECT {id_col} AS query_id, {vec_col} AS _qvec FROM {table} WHERE {query_pred}),
c AS (SELECT {id_col} AS neighbor_id, {vec_col} AS _cvec FROM {table}),
scored AS (
  SELECT q.query_id, c.neighbor_id, {cos} AS cosine
  FROM c JOIN q ON c.neighbor_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank,
         cosine
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine FROM ranked WHERE rank <= {k}
"""


_N_PLANES = 8


def _hyperplanes(dim: int, seed: int = 99) -> np.ndarray:
    return np.random.RandomState(seed).randn(_N_PLANES, dim)


def lsh_bucket_col(vec: Column, dim: int, seed: int = 99) -> Column:
    """Sign-random-projection bucket id (0..2^planes-1)."""
    planes = _hyperplanes(dim, seed)
    bucket = F.lit(0)
    for p_idx in range(_N_PLANES):
        plane = F.array(*[F.lit(float(x)) for x in planes[p_idx]])
        bucket = bucket + F.when(dot_col(vec, plane) > 0, F.lit(1 << p_idx)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 99,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Equi-join on bucket → shuffle width = N, not N×Q."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket_col(F.col(vec_col), dim, seed).alias("_bucket"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        lsh_bucket_col(F.col(vec_col), dim, seed).alias("_bucket"),
    )
    joined = c.join(F.broadcast(q), "_bucket").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.withColumn("cosine", cosine_col(F.col("_qvec"), F.col("_cvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Cosine >= threshold pairs within a blocking key."""
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col(block_col).alias("_blk")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col(block_col).alias("_blk")
    )
    pairs = a.join(b, "_blk").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", cosine_col(F.col("_va"), F.col("_vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_duplicates_sql(
    table: str,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> str:
    cos = cosine_sql("a._va", "b._vb")
    return f"""
WITH a AS (SELECT {id_col} AS id_a, {vec_col} AS _va, {block_col} AS _blk FROM {table}),
b AS (SELECT {id_col} AS id_b, {vec_col} AS _vb, {block_col} AS _blk FROM {table})
SELECT id_a, id_b, round({cos}, 6) AS cosine
FROM a JOIN b ON a._blk = b._blk AND a.id_a < b.id_b
WHERE {cos} >= {threshold}
"""
