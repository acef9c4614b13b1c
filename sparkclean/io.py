"""Bucketed table IO — co-located joins without shuffles.

At 100 TB the dominant cost of the id-keyed joins this engine issues
(edge lists back to vectors, issue frames back to features, score tables
joined per round) is the shuffle.  Writing both sides ``bucketBy`` the
join key once makes every later equi-join on that key shuffle-free: the
scan reports the hash-partitioning to Catalyst, which plans a
SortMergeJoin with NO Exchange on either side (asserted by
tests/test_bucketed_io.py).

Usage pattern for a multi-round pipeline over one corpus:

    write_bucketed(features, "feat", ["image_id"], 256, path=...)
    write_bucketed(scores,   "sc",   ["image_id"], 256, path=...)
    spark.table("feat").join(spark.table("sc"), "image_id")   # no shuffle

The bucket count is the co-location contract — both sides must use the
same ``n_buckets`` and key; pick it once per corpus (≈ total size /
target partition size) and keep it stable across rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) parquet table.

    ``sort_cols`` additionally sorts within each bucket file, which lets
    the later SortMergeJoin skip its sort too."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (the catalog carries the bucket spec — a
    plain ``spark.read.parquet(path)`` would NOT, and would shuffle)."""
    return spark.table(table)
