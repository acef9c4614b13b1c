"""Distributed connected components over an undirected pair list.

The shared "cluster the near-duplicate pairs" primitive behind
``dedup.hamming.hamming_clusters`` and
``dedup.minhash.near_duplicate_clusters`` (reference intent: the
near_duplicate manager's duplicate SETS, duplicate.py:89-120, re-expressed
as components of the pair graph).

Scale shape: only PAIRED nodes enter the loop (near-dup graphs are tiny
relative to N); each round is one equi-join + partial agg + a self-join
pointer jump with lineage cut by lazy localCheckpoint — O(log diameter)
rounds.  Labels only ever decrease toward the component min, so
convergence is a narrow changed-row count carried as a column: no extra
join, and it works for string ids where a numeric-sum check cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def component_labels(
    pairs_df: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """``(id, comp)`` for every node TOUCHED by ``pairs_df`` (undirected):
    comp = min id in the node's connected component.  The raw label
    loop behind :func:`components_from_pairs`; callers that cluster at a
    collapsed/representative level (e.g. distinct-fingerprint dedup)
    use this directly and expand membership themselves.  Raises if
    ``max_iter`` pointer-jumping rounds do not converge —
    partially-converged labels would silently split true components."""
    pairs = pairs_df.select(F.col(src_col).alias("id_a"), F.col(dst_col).alias("id_b"))
    edges = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).persist()
    touched = edges.select(F.col("id_a").alias("id")).distinct()
    comp = touched.withColumn("comp", F.col("id")).localCheckpoint(eager=False)
    changed = None
    for _ in range(max_iter):
        nbr_min = (
            edges.join(comp.select(F.col("id").alias("id_b"), "comp"), "id_b")
            .groupBy(F.col("id_a").alias("id"))
            .agg(F.min("comp").alias("_nc"))
        )
        stepped = (
            comp.join(nbr_min, "id", "left")
            .select(
                "id",
                F.col("comp").alias("_prev"),
                F.least(F.col("comp"), F.coalesce("_nc", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        jumped = (
            stepped.alias("a")
            .join(
                stepped.select(
                    F.col("id").alias("comp"), F.col("comp").alias("_root")
                ).alias("b"),
                "comp",
                "left",
            )
            .select("id", "_prev", F.coalesce("_root", "comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        changed = (
            jumped.agg(F.count(F.when(F.col("comp") != F.col("_prev"), 1))).collect()[0][0]
        )
        comp = jumped.drop("_prev")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"component_labels did not converge in {max_iter} rounds "
            f"({changed} labels still moving); raise max_iter"
        )
    return comp


def components_from_pairs(
    pairs_df: DataFrame,
    nodes_df: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """``(id, cluster_rep, cluster_size)`` for every row of ``nodes_df``
    (single column ``id``): cluster_rep = min id in the connected
    component of the undirected ``pairs_df`` graph; singletons keep
    themselves at size 1."""
    comp = component_labels(pairs_df, src_col, dst_col, max_iter)
    asg = nodes_df.join(comp, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("cluster_rep")
    )
    sizes = asg.groupBy("cluster_rep").agg(F.count(F.lit(1)).alias("cluster_size"))
    # edges stays persisted until the caller's next clearCache — the
    # returned frame reads it lazily (same contract as knn_edges)
    return asg.join(sizes, "cluster_rep").select("id", "cluster_rep", "cluster_size")


def components_sql(pairs_sql: str, table: str, id_col: str) -> str:
    """DuckDB twin of :func:`components_from_pairs`: recursive
    reachability (component label = min reaching id — fine at oracle
    scale) over ``pairs_sql``, any SELECT producing (id_a, id_b, ...),
    nested as a CTE body (DuckDB allows an inner WITH there)."""
    return f"""
WITH RECURSIVE gpairs AS MATERIALIZED (
{pairs_sql}
),
gedges AS (
  SELECT id_a AS src, id_b AS dst FROM gpairs
  UNION
  SELECT id_b, id_a FROM gpairs
),
greach AS (
  SELECT src AS id, src AS comp FROM gedges
  UNION
  SELECT e.dst AS id, r.comp FROM greach r JOIN gedges e ON e.src = r.id
),
gcomp AS (SELECT id, min(comp) AS comp FROM greach GROUP BY id),
gall AS (SELECT {id_col} AS id FROM {table}),
gasg AS (
  SELECT a.id, coalesce(c.comp, a.id) AS cluster_rep
  FROM gall a LEFT JOIN gcomp c USING (id)
),
gsizes AS (SELECT cluster_rep, count(*) AS cluster_size FROM gasg GROUP BY 1)
SELECT id AS {id_col}, cluster_rep, cluster_size
FROM gasg JOIN gsizes USING (cluster_rep)"""
