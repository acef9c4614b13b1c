"""SparkSession factory tuned for the quality-filter workload.

Defaults are chosen for the 100 TB design point and scale down fine to
local mode:

* AQE on (runtime coalescing + skew-join splitting for the hot-language /
  phash-cluster skew called out in SURVEY.md §2.12).
* Arrow enabled — every Python-side scorer runs as a vectorized
  pandas/Arrow UDF, never per-row Python.
* Modest shuffle partition default for local runs; on a real cluster this
  is overridden via spark-submit conf (or left to AQE's initialPartitionNum).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparkclean",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARKCLEAN_MASTER", "local[*]")
    if master == "env":
        # the taskset-pinned scaling convention: local[$SPARK_GRAFT_CPUS],
        # falling back to local[*] when the var is unset instead of
        # letting the literal sentinel reach Spark's master-URL parser
        cores = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARKCLEAN_SHUFFLE_PARTITIONS", "32"))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # smaller Arrow batches keep JVM→Python transfer of the wide
        # binary column pipelined (40MB batches serialize poorly at high
        # task concurrency; measured 2.3× faster at 32 cores with 1024)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # multi-KB binary blobs: 4096-row columnar batches overflow the
        # vectorized reader's contiguous buffer — keep batches small
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.driver.memory", os.environ.get("SPARKCLEAN_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
