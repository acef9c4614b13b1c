"""Distributed connected components over an undirected pair list.

The shared "cluster the near-duplicate pairs" primitive behind
``dedup.hamming.hamming_clusters`` and
``dedup.minhash.near_duplicate_clusters`` (reference intent: the
near_duplicate manager's duplicate SETS, duplicate.py:89-120, re-expressed
as components of the pair graph).

Algorithm: alternating large-star / small-star contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond", SoCC 2014 — a public algorithm, re-expressed in
DataFrame ops).  Each round rewrites the EDGE LIST so every node hooks
to the minimum of its neighborhood; the paper proves connectivity is
preserved and convergence takes O(log² n) rounds worst-case, ~log n in
practice.  At the fixpoint the edge set is a star per component
(node → component-min), which IS the label table.

This replaced the round-1..4 min-label-propagation + single pointer
jump loop after a planted giant-path stress (round 5) showed two
failure modes the small-diameter dedup graphs never exercised: label
propagation crawls the path tail hop-by-hop (O(diameter) rounds), and
the lazy ``localCheckpoint(eager=False)`` chain did not actually
truncate lineage under AQE — per-round wall time tripled every round
once plans nested ~18 deep.  Checkpoints are now EAGER per round
(bounded plan, measured flat per-round cost), and the star contraction
gives the O(log) round count the 100 TB story needs.

Ids may be strings (hamming clusters image ids) — "minimum" is the
column type's natural ordering, matching min()/least() everywhere else
in the cluster twins.  Convergence check: (edge count, exact decimal
sum of per-edge xxhash64) fixpoint — one narrow agg per round, the
round-3 decimal-sum convergence pattern; a false positive needs a
2⁻⁶⁴ hash-sum collision.

Cluster deployment note: ``localCheckpoint`` stores blocks on executor
local storage — fast, but NOT fault-tolerant (an executor loss kills
the truncated lineage).  In-sandbox (single JVM) that is the right
trade; on a 1000-executor cluster running hour-long jobs, set
``spark.sparkContext.setCheckpointDir`` to durable storage and switch
the two ``localCheckpoint(eager=True)`` calls to ``checkpoint()`` —
the algorithm is unchanged, each round's edge list is small (near-dup
graphs are sparse relative to the corpus), and the durable write cost
is paid O(log n) times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) edge list → large-star step: for every node n, connect all
    strictly-larger neighbors to min(Γ(n) ∪ {n})."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("_m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.least("_m", F.col("u")).alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """(u,v) edge list → small-star step: orient every edge
    (larger → smaller), then connect each node's smaller neighbors (and
    itself) to the minimum of that set."""
    d = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("_m"))
    hooked = d.join(mins, "u")
    return (
        hooked.where(F.col("v") != F.col("_m"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .unionByName(mins.select("u", F.col("_m").alias("v")))
        .distinct()
    )


def component_labels(
    pairs_df: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
    rounds_out: list | None = None,
) -> DataFrame:
    """``(id, comp)`` for every node TOUCHED by ``pairs_df`` (undirected):
    comp = min id in the node's connected component.  The raw primitive
    behind :func:`components_from_pairs`; callers that cluster at a
    collapsed/representative level (e.g. distinct-fingerprint dedup)
    use this directly and expand membership themselves.  Raises if
    ``max_iter`` large+small-star rounds do not converge —
    partially-converged labels would silently split true components.

    ``rounds_out``, if given, receives the number of rounds actually run
    (the O(log n) claim is pinned by a planted giant path+star worst-case
    test — tests/test_graph_ops.py).

    Implementation note: constraint propagation is disabled for the
    loop's own jobs (and restored after).  The star steps self-union a
    checkpointed frame with a column-swapped projection of itself, and
    Spark's ``UnionBase.rewriteConstraints`` throws
    ``NoSuchElementException: key not found`` on that shape whenever the
    id columns are nullable (any parquet source) — reproduced minimally
    in round 5.  The loop pre-filters nulls and joins on equi-keys, so
    the inferred IsNotNull filters the setting would add are redundant
    here; the returned frame is eagerly checkpointed so callers compose
    against a plain scan, never the fragile union plan.  The toggle is
    session-global state: this loop must not run concurrently with
    other queries on the same session (the repo's topology — one driver
    thread, harness-serial queries — guarantees that; a concurrent
    caller could observe constraint propagation off, or re-enable it
    mid-loop and resurface the union bug)."""
    spark = pairs_df.sparkSession
    _CP = "spark.sql.constraintPropagation.enabled"
    prior_cp = spark.conf.get(_CP, "true")
    spark.conf.set(_CP, "false")
    try:
        edges = (
            pairs_df.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
            .where(F.col("u") != F.col("v"))
            .where(F.col("u").isNotNull() & F.col("v").isNotNull())
            .distinct()
            .localCheckpoint(eager=True)
        )
        touched = (
            edges.select("u")
            .unionByName(edges.select(F.col("v").alias("u")))
            .distinct()
            .select(F.col("u").alias("id"))
        )

        def _checksum(e: DataFrame) -> tuple[int, int]:
            r = e.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
            return int(r["n"]), int(r["h"] or 0)

        prev = None
        converged = False
        for _round in range(max_iter):
            edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
            chk = _checksum(edges)
            if chk == prev:
                converged = True
                if rounds_out is not None:
                    rounds_out.append(_round + 1)
                break
            prev = chk
        if not converged:
            raise RuntimeError(
                f"component_labels did not converge in {max_iter} rounds; "
                "raise max_iter"
            )
        # fixpoint edge set is a star per component: (node, component-min)
        parents = edges.groupBy(F.col("u").alias("id")).agg(F.min("v").alias("_p"))
        return (
            touched.join(parents, "id", "left")
            .select("id", F.coalesce("_p", F.col("id")).alias("comp"))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set(_CP, prior_cp)


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
    # asg is the small (id, cluster_rep) frame consumed twice (sizes agg
    # + final join); the cut keeps each consumer from re-evaluating
    # nodes_df's lineage (same discipline as the dedup membership cuts)
    asg = (
        nodes_df.join(comp, "id", "left")
        .select("id", F.coalesce("comp", F.col("id")).alias("cluster_rep"))
        .localCheckpoint(eager=True)
    )
    sizes = asg.groupBy("cluster_rep").agg(F.count(F.lit(1)).alias("cluster_size"))
    # nothing is left persisted: the loop's intermediates live as eager
    # local checkpoints referenced (only) by the returned frame's plan
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
