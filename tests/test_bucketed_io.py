"""Bucketed IO: equal-bucketed tables join WITHOUT any Exchange."""

import pytest
from pyspark.sql import functions as F

from sparkclean.io import read_bucketed, write_bucketed


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = df.select("vec_id", "label")
    b = df.select("vec_id", F.size("embedding").alias("dim"))
    write_bucketed(a, "bkt_a", ["vec_id"], 8, sort_cols=["vec_id"], path=str(tmp_path / "a"))
    write_bucketed(b, "bkt_b", ["vec_id"], 8, sort_cols=["vec_id"], path=str(tmp_path / "b"))
    yield "bkt_a", "bkt_b"
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ta, tb = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, ta).join(read_bucketed(spark, tb), "vec_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == spark.table(ta).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the layout."""
    ta, _ = bucketed_tables
    agg = read_bucketed(spark, ta).groupBy("vec_id").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
