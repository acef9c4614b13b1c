"""Exact deduplication via normalized-text fingerprint (hash-groupBy).

Scale notes: one shuffle keyed by the 60-bit fingerprint; AQE splits the
giant duplicate clusters (Zipf-sized phash/caption clusters are the skew
case called out in SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..text.tokenize import fingerprint_col, fingerprint_sql


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rows belonging to exact-duplicate clusters (size > 1), tagged with
    the cluster representative (min id) and cluster size."""
    fp = df.select(F.col(id_col), fingerprint_col(F.col(text_col)).alias("fp"))
    w = Window.partitionBy("fp")
    out = (
        fp.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("cluster_rep", F.min(id_col).over(w))
        .where(F.col("cluster_size") > 1)
    )
    return out.select(id_col, "fp", "cluster_size", "cluster_rep")


def exact_duplicates_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    fp = fingerprint_sql(text_col)
    return f"""
WITH fp AS (SELECT {id_col}, {fp} AS fp FROM {table}),
clustered AS (
  SELECT {id_col}, fp,
         count(*) OVER (PARTITION BY fp) AS cluster_size,
         min({id_col}) OVER (PARTITION BY fp) AS cluster_rep
  FROM fp
)
SELECT {id_col}, fp, cluster_size, cluster_rep FROM clustered WHERE cluster_size > 1
"""


def distinct_by_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per fingerprint — the dedup pass a
    training pipeline actually applies."""
    fp = df.withColumn("_fp", fingerprint_col(F.col(text_col)))
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
    return fp.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_fp", "_rn")
