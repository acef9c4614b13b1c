"""Parallelism & skew handling (SURVEY.md §2.12).

* :func:`ensure_parallelism` — small local inputs often arrive as one
  parquet split; fan them out to the session's core count before the
  CPU-heavy projection stages.  At 100 TB the scan already has thousands
  of splits and this is a no-op (condition never triggers).
* :func:`salted_repartition` — break hot keys (hot language, giant
  phash/caption duplicate clusters) across ``salt_buckets`` shuffle
  partitions; pair with a two-stage aggregation (partial per salt,
  final per key).  AQE skew-join splitting is enabled globally in
  session.py for the join side of the same problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(
    df: DataFrame, target: int | None = None, max_factor: int = 4
) -> DataFrame:
    """Clamp partition count into [target, target·max_factor].

    Too few partitions → idle cores; far too many → the multi-job
    downstream phase (cache materialise, thresholds agg, issue count,
    quantile, bottom-n, final write) pays driver-side task-launch
    overhead per job × per partition, which is serial and dominated the
    scaling profile (512-task × 8-job runs spent ~35 s in scheduling).
    The repartition shuffles only the narrow projection — cheap and
    fully parallel.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    # Partition-count probe WITHOUT df.rdd: converting a python-source
    # plan to an RDD forces physical planning + Arrow conversion (~3 s
    # measured on the decode path).  For scans, the file list is a free
    # metadata call and bounds the split count from below; plans with no
    # file scan fall back to the (cheap, JVM-side) rdd probe.
    try:
        n = len(df.inputFiles()) or None
    except Exception:
        n = None
    if n is None:
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    if n > target * max_factor:
        return df.repartition(target * 2)
    return df


def salted_repartition(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 16, salt_col: str = "_salt"
) -> DataFrame:
    """Repartition by (keys..., salt) so one hot key spreads over
    ``salt_buckets`` partitions.  Deterministic salt from a row hash, so
    the layout is stable across retries."""
    salted = df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    return salted.repartition(*[F.col(c) for c in key_cols], F.col(salt_col))
