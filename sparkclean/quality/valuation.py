"""Data valuation (KNN-Shapley) and non-IID detection — distributed.

* :func:`knn_shapley_scores` — data_valuation.py:14-127 semantics.  The
  reference's O(N²) scores matrix hides a telescoping recursion:
  with m_j = 1[y(neighbor_j) == y(α)] and s[idx_{k-1}] = 0,

      s_α[idx_j] = m_j - m_{k-1}

  so each example α contributes (m_j - m_{k-1}) to its j-th neighbor
  and the final value of point i is 0.5·(Σ_α s_α[i]/(N·k) + 1).
  That's a KNN edge list + one groupBy — no N×N anything.

* :func:`non_iid_ks` — simplified Kolmogorov-Smirnov two-sample test
  (noniid.py:19-57 analog): split the dataset into two halves by id,
  compare a score column's distributions; D = max |ECDF_a - ECDF_b|
  via a windowed cumulative count over the sorted union; issue flag at
  the 95% KS critical value 1.36·sqrt((n_a+n_b)/(n_a·n_b)).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sim.knn import cosine_col


def knn_shapley_scores(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, data_valuation_score) — higher = more valuable example."""
    total = df.count()
    a = df.select(
        F.col(id_col).alias("_qid"), F.col(label_col).alias("_qy"), F.col(vec_col).alias("_qv")
    )
    b = df.select(
        F.col(id_col).alias("_nid"), F.col(label_col).alias("_ny"), F.col(vec_col).alias("_nv")
    )
    pairs = a.join(b, F.col("_qid") != F.col("_nid")).withColumn(
        "_dist", F.lit(1.0) - cosine_col(F.col("_qv"), F.col("_nv"))
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_dist").asc(), F.col("_nid").asc())
    edges = (
        pairs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(
            "_qid",
            "_nid",
            "_rk",
            (F.col("_ny") == F.col("_qy")).cast("double").alias("_m"),
        )
    )
    last = edges.where(F.col("_rk") == k).select(
        F.col("_qid"), F.col("_m").alias("_m_last")
    )
    contrib = edges.join(last, "_qid").withColumn("_c", F.col("_m") - F.col("_m_last"))
    sums = contrib.groupBy(F.col("_nid").alias(id_col)).agg(F.sum("_c").alias("_s"))
    return (
        df.select(id_col)
        .join(sums, id_col, "left")
        .fillna({"_s": 0.0})
        .select(
            id_col,
            (F.lit(0.5) * (F.col("_s") / F.lit(float(total * k)) + F.lit(1.0))).alias(
                "data_valuation_score"
            ),
        )
    )


def knn_shapley_sql(table: str, k: int = 10) -> str:
    """DuckDB twin of :func:`knn_shapley_scores` (embeddings schema)."""
    dot = (
        "list_aggregate(list_transform(range(1, len(a.embedding) + 1),"
        " i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum')"
    )
    na = "sqrt(list_aggregate(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    nb = "sqrt(list_aggregate(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    return f"""
WITH tot AS (SELECT count(*)::DOUBLE AS n FROM {table}),
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid, a.label AS qy, b.label AS ny,
         1.0 - ({dot} / ({na} * {nb})) AS d
  FROM {table} a JOIN {table} b ON a.vec_id <> b.vec_id
), edges AS (
  SELECT qid, nid, CASE WHEN ny = qy THEN 1.0 ELSE 0.0 END AS m,
         row_number() OVER (PARTITION BY qid ORDER BY d ASC, nid ASC) AS rk
  FROM pairs
), kept AS (SELECT * FROM edges WHERE rk <= {k}),
last AS (SELECT qid, m AS m_last FROM kept WHERE rk = {k}),
contrib AS (
  SELECT kept.nid, kept.m - last.m_last AS c FROM kept JOIN last USING (qid)
), sums AS (SELECT nid, sum(c) AS s FROM contrib GROUP BY 1)
SELECT e.vec_id, round(0.5 * (coalesce(sums.s, 0.0) / (tot.n * {k}) + 1.0), 6) AS data_valuation_score
FROM {table} e LEFT JOIN sums ON sums.nid = e.vec_id CROSS JOIN tot"""


def non_iid_ks(
    df: DataFrame, id_col: str, value_col: str
) -> DataFrame:
    """One-row result: (ks_statistic, n_a, n_b, is_non_iid_issue)."""
    median_id = df.agg(F.expr(f"percentile({id_col}, 0.5)")).collect()[0][0]
    tagged = df.select(
        F.col(value_col).alias("_v"),
        (F.col(id_col) <= F.lit(median_id)).cast("int").alias("_a"),
    )
    counts = tagged.agg(
        F.sum("_a").alias("na"), F.sum(F.lit(1) - F.col("_a")).alias("nb")
    ).collect()[0]
    n_a, n_b = int(counts["na"]), int(counts["nb"])
    w = Window.orderBy(F.col("_v").asc()).rowsBetween(Window.unboundedPreceding, 0)
    ecdf = tagged.withColumn("_ca", F.sum("_a").over(w)).withColumn(
        "_cb", F.sum(F.lit(1) - F.col("_a")).over(w)
    )
    d = ecdf.agg(
        F.max(
            F.abs(
                F.col("_ca").cast("double") / F.lit(float(n_a))
                - F.col("_cb").cast("double") / F.lit(float(n_b))
            )
        ).alias("d")
    ).collect()[0]["d"]
    crit = 1.36 * math.sqrt((n_a + n_b) / (n_a * n_b))
    spark = df.sparkSession
    return spark.createDataFrame(
        [(float(round(d, 6)), n_a, n_b, bool(d > crit))],
        "ks_statistic: double, n_a: long, n_b: long, is_non_iid_issue: boolean",
    )
