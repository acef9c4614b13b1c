"""IVF (inverted-file) approximate nearest neighbour search.

The second scale path BASELINE.json names next to LSH: a coarse k-means
quantizer partitions the corpus into ``n_cells`` Voronoi cells; each
query probes only its ``n_probe`` nearest cells, so the exact-distance
work drops from N to ~N·n_probe/n_cells per query while the candidate
join stays an equi-join on the cell id (no cartesian).

Determinism contract (mirrors sim.knn): centroid init is data-deterministic
(the rows with the ``n_cells`` smallest ids), Lloyd iterations are a fixed
count of assign→mean rounds, and every distance uses the same per-dimension
sequential accumulation as the DuckDB twin.  Engine-to-engine centroid
means can differ in the last ulp (different partial-aggregation order);
assignments are robust to that except exactly ON a Voronoi boundary
(measure-zero for continuous features).

At 100 TB: training collects only C×dim centroid floats per iteration;
assignment and search are scans + one groupBy(cell) shuffle; cell skew is
bounded by re-training with larger ``n_cells`` (the knob that must grow
with N, like band bits for LSH).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

IVF_CELLS = 16
IVF_PROBE = 4
IVF_ITERS = 2


def _dist2_matrix(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Squared distances with per-dimension sequential accumulation —
    same fold order on every engine."""
    acc = np.zeros((m.shape[0], cents.shape[0]))
    for d in range(m.shape[1]):
        t = m[:, d][:, None] - cents[:, d][None, :]
        acc += t * t
    return acc


def _assign_udf(cents: np.ndarray):
    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series(np.argmin(_dist2_matrix(m, cents), axis=1).astype(np.int32))

    return assign


def _probe_udf(cents: np.ndarray, n_probe: int):
    @pandas_udf("array<int>")
    def probes(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        d2 = _dist2_matrix(m, cents)
        # n_probe nearest cells, distance then cell-id order (stable)
        order = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    return probes


def train_centroids(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
) -> np.ndarray:
    """Deterministic Lloyd training: init from the ``n_cells`` smallest
    ids, then ``n_iters`` assign→per-dim-mean rounds.  Driver traffic is
    C×dim floats per round; the heavy work is scans + K-sized shuffles."""
    init_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .collect()
    )
    if len(init_rows) < n_cells:
        raise ValueError(
            f"IVF needs at least n_cells={n_cells} rows to initialise centroids"
        )
    # cell c = the row with the c-th smallest id (rank, not raw id, so the
    # init is identical for non-dense / offset id spaces — matches the
    # SQL twin's row_number init)
    cents = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in init_rows]
    )

    for _ in range(n_iters):
        assigned = df.select(
            _assign_udf(cents)(F.col(vec_col)).alias("_cell"), F.col(vec_col)
        )
        aggs = [
            F.avg(F.element_at(F.col(vec_col), d + 1).cast("double")).alias(f"_m{d}")
            for d in range(dim)
        ]
        rows = assigned.groupBy("_cell").agg(*aggs).collect()
        for r in rows:
            cents[int(r["_cell"])] = [r[f"_m{d}"] for d in range(dim)]
        # empty cells keep their previous centroid
    return cents


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBE,
    n_iters: int = IVF_ITERS,
    centroids: np.ndarray | None = None,
    cell_col: str | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's
    ``n_probe`` nearest IVF cells — an equi-join on cell id.

    ``centroids`` (from :func:`train_centroids`) lets callers amortise
    index training across query batches — at corpus scale the index is
    built once and queried many times, so train and query cost are
    reported separately in bench/ann.py.  ``cell_col`` names an ALREADY
    MATERIALISED cell-assignment column on ``df`` (the 100 TB shape: the
    cell id is written into the table — ideally as its partition key, so
    probes prune at the scan — rather than recomputed per query batch);
    when absent the assignment runs inline."""
    from .knn import pair_dist_udf

    if cell_col is not None and centroids is None:
        # the materialised assignment's centroids are unknowable here:
        # training a fresh set would probe cells that do not correspond
        # to the stored cell ids — recall silently collapses with no
        # error.  Demand the matching centroids.
        raise ValueError(
            "cell_col requires the centroids that produced the stored "
            "assignment (pass centroids=...); training fresh centroids "
            "would probe mismatched cells"
        )
    cents = (
        centroids
        if centroids is not None
        else train_centroids(df, dim, id_col, vec_col, n_cells, n_iters)
    )
    if cell_col is not None:
        if cell_col not in df.columns:
            # a typo here would silently re-assign cells per query batch —
            # the exact per-batch cost the parameter exists to amortise
            raise ValueError(
                f"cell_col {cell_col!r} not in df columns {df.columns}"
            )
        indexed = df.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cvec"),
            F.col(cell_col).alias("_cell"),
        )
    else:
        indexed = df.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cvec"),
            _assign_udf(cents)(F.col(vec_col)).alias("_cell"),
        )
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.explode(_probe_udf(cents, n_probe)(F.col(vec_col))).alias("_cell"),
    )
    joined = indexed.join(F.broadcast(probed), "_cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.withColumn(
        "cosine", pair_dist_udf(dim, "cosine_sim")(F.col("_qvec"), F.col("_cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def _dist2_sql(vec_expr: str, cent_expr: str, dim: int) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {dim + 1}), "
        f"i -> pow({vec_expr}[i]::DOUBLE - {cent_expr}[i], 2)), 'sum')"
    )


def ivf_topk_sql(
    table: str,
    query_pred: str,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBE,
    n_iters: int = IVF_ITERS,
) -> str:
    """DuckDB twin of :func:`ivf_topk`: same init, same fixed Lloyd
    rounds (unrolled as CTEs), same probe rule, same tie orders."""
    from .knn import cosine_sql

    d2 = _dist2_sql("v._v", "c.vec", dim)
    mean_list = (
        "list(m ORDER BY d) AS vec FROM ("
        f"SELECT _cell, d.d AS d, avg(_v[d.d + 1]::DOUBLE) AS m "
        "FROM {src} CROSS JOIN range(0, " + str(dim) + ") d(d) GROUP BY 1, 2) GROUP BY _cell"
    )

    def assign_cte(cents: str, out: str) -> str:
        return f"""{out}_d AS (
  SELECT v._id, v._v, c.cell, {d2} AS d2
  FROM vr v CROSS JOIN {cents} c
), {out} AS (
  SELECT _id, _v, cell AS _cell FROM (
    SELECT _id, _v, cell,
           row_number() OVER (PARTITION BY _id ORDER BY d2 ASC, cell ASC) AS rn
    FROM {out}_d
  ) WHERE rn = 1
)"""

    def update_cte(assigned: str, prev: str, out: str) -> str:
        # empty cells inherit the previous centroid
        return f"""{out}_m AS (
  SELECT _cell AS cell, {mean_list.format(src=assigned)}
), {out} AS (
  SELECT p.cell, coalesce(m.vec, p.vec) AS vec
  FROM {prev} p LEFT JOIN {out}_m m ON m.cell = p.cell
)"""

    ctes = [
        f"vr AS MATERIALIZED (SELECT {id_col} AS _id, {vec_col} AS _v FROM {table})",
        f"""cents0 AS (
  SELECT (row_number() OVER (ORDER BY _id ASC) - 1)::INT AS cell,
         list_transform(_v, x -> x::DOUBLE) AS vec
  FROM vr ORDER BY _id ASC LIMIT {n_cells}
)""",
    ]
    prev = "cents0"
    for it in range(n_iters):
        ctes.append(assign_cte(prev, f"asg{it}"))
        ctes.append(update_cte(f"asg{it}", prev, f"cents{it + 1}"))
        prev = f"cents{it + 1}"
    cos = cosine_sql("q._qv", "n._v")
    body = f"""{assign_cte(prev, "final_asg")},
qprobe AS (
  SELECT _id AS query_id, _v AS _qv, cell AS _cell FROM (
    SELECT v._id, v._v, c.cell,
           row_number() OVER (PARTITION BY v._id ORDER BY {d2} ASC, c.cell ASC) AS rn
    FROM vr v CROSS JOIN {prev} c
    WHERE v._id IN (SELECT {id_col} FROM {table} WHERE {query_pred})
  ) WHERE rn <= {n_probe}
),
scored AS (
  SELECT q.query_id, n._id AS neighbor_id, {cos} AS cosine
  FROM qprobe q JOIN final_asg n ON n._cell = q._cell AND n._id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine FROM ranked WHERE rank <= {k}"""
    return "WITH " + ",\n".join(ctes) + ",\n" + body
