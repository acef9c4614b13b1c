"""Round-3 advisor-fix coverage: ensure_parallelism's split replay and
knn_shapley's tiny-table degradation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkclean.skew import _is_pure_scan, ensure_parallelism


def test_ensure_parallelism_pure_scan_no_false_repartition(spark, tmp_path):
    """For a small single-file scan the bytesPerCore clamp must predict
    the ACTUAL scan partition count (defaultParallelism splits, not
    ceil(total/maxPartitionBytes) = 1), so no repartition is inserted
    when the scan already fans out."""
    path = str(tmp_path / "t")
    spark.range(0, 200_000).select(
        F.col("id"), F.rand(7).alias("x")
    ).coalesce(1).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    actual = df.rdd.getNumPartitions()
    out = ensure_parallelism(df, target=actual)
    # the estimate should agree with the actual layout → no repartition
    assert "Repartition" not in out._jdf.queryExecution().analyzed().toString()


def test_is_pure_scan_detects_shuffles(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(0, 1000).write.mode("overwrite").parquet(path)
    scan = spark.read.parquet(path)
    assert _is_pure_scan(scan)
    assert _is_pure_scan(scan.select((F.col("id") * 2).alias("y")))
    assert not _is_pure_scan(scan.groupBy("id").count())
    assert not _is_pure_scan(scan.join(scan.select("id"), "id"))
    assert not _is_pure_scan(scan.repartition(4))


def test_knn_shapley_tiny_table_uses_max_rank_edge(spark):
    """With N <= k every query has < k edges; the max-rank fallback must
    keep contributions flowing instead of silently degenerating all
    scores to the 0.5·(0/.. + 1) baseline."""
    from sparkclean.quality.valuation import knn_shapley_scores

    rng = np.random.RandomState(3)
    rows = [
        (i, [float(v) for v in rng.normal(0, 1, 8)], i % 2) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>, label: int")
    out = {r["vec_id"]: r["data_valuation_score"]
           for r in knn_shapley_scores(df, k=10).collect()}
    assert len(out) == 6
    # contributions exist: not every score collapses to the 0.5 baseline
    assert any(abs(v - 0.5) > 1e-9 for v in out.values()), out


def test_salted_repartition_spreads_hot_key(spark):
    """skew.salted_repartition (the north-rule hot-language /
    phash-mega-cluster mitigation): a 90%-hot key must land in every
    salt bucket (spread over salt_buckets partitions instead of one),
    the salt must be deterministic (stable layout across retries), and
    a two-stage aggregation over the salted frame must equal the
    unsalted truth."""
    from pyspark.sql import functions as F

    from sparkclean.skew import salted_repartition

    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("en")).otherwise(F.lit("fr")).alias("lang"),
        (F.col("id") % 7).alias("v"),
    )
    salted = salted_repartition(df, ["lang"], salt_buckets=8, id_cols=["doc_id"])
    # hot key spreads: the 'en' rows occupy (nearly) all 8 salt values
    n_salts = salted.where(F.col("lang") == "en").select("_salt").distinct().count()
    assert n_salts >= 7, n_salts
    # determinism across two materialisations
    s1 = salted.groupBy("lang", "_salt").count().orderBy("lang", "_salt").collect()
    s2 = (
        salted_repartition(df, ["lang"], salt_buckets=8, id_cols=["doc_id"])
        .groupBy("lang", "_salt").count().orderBy("lang", "_salt").collect()
    )
    # duplicate-content hot group (the phash-mega-cluster shape): a
    # CONTENT-hashed salt maps identical rows to one salt; the identity
    # salt must spread them
    dup = spark.range(800).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"), F.lit(0).alias("v")
    )
    spread = (
        salted_repartition(dup, ["lang"], salt_buckets=8, id_cols=["doc_id"])
        .select("_salt").distinct().count()
    )
    assert spread == 8, spread
    assert s1 == s2
    # two-stage agg (partial per (key, salt), then final per key) ==
    # unsalted truth
    partial = salted.groupBy("lang", "_salt").agg(
        F.sum("v").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    final = {
        r["lang"]: (r["s"], r["n"])
        for r in partial.groupBy("lang")
        .agg(F.sum("_s").alias("s"), F.sum("_n").alias("n"))
        .collect()
    }
    truth = {
        r["lang"]: (r["s"], r["n"])
        for r in df.groupBy("lang")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == truth
