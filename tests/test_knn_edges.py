"""Shared bucketed KNN-edge builder (sim.knn.knn_edges).

Three contracts:

1. Structure — every row gets exactly k edges (rescue backstop), rk is a
   1..k permutation per query, and distances are monotone in rk.
2. Recall — on a planted-cluster fixture (tight clusters, the workload
   LSH is for: near-duplicate / near-neighbor mining where neighbors ARE
   angularly close), the bucketed edge list recovers ≥ 95% of the exact
   brute-force 10-NN edges.  (On isotropic noise the 10-NN sit at ~72°
   and no sublinear bucketing can find them — that regime is documented,
   not asserted.)
3. Plan shape — no CartesianProduct anywhere in the physical plans of
   knn_edges or its four consumers; the only non-equi join allowed is
   the broadcast rescue backstop.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window

from sparkclean.sim.knn import (
    embedding_near_duplicates,
    euclidean_col,
    knn_edges,
    lsh_topk,
)

K = 10
DIM = 16


@pytest.fixture(scope="module")
def clustered(spark):
    """40 tight clusters x 25 points: within-cluster angle is small, so
    true 10-NN are same-cluster — the regime LSH buckets are built for."""
    rng = np.random.RandomState(7)
    centers = rng.randn(40, DIM) * 3.0
    rows = []
    i = 0
    for c in range(40):
        for _ in range(25):
            v = centers[c] + rng.randn(DIM) * 0.15
            rows.append((i, [float(x) for x in v], c % 10))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int"
    ).cache()


def brute_edges(df, k, metric="euclidean"):
    a = df.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("_qa"))
    b = df.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("_nb"))
    pairs = a.join(b, F.col("qid") != F.col("nid")).withColumn(
        "d", euclidean_col(F.col("_qa"), F.col("_nb"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("d").asc(), F.col("nid").asc())
    return pairs.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def test_structure_exact_k(clustered):
    edges = knn_edges(clustered, k=K, dim=DIM).cache()
    n = clustered.count()
    assert edges.count() == n * K
    per_q = edges.groupBy("qid").agg(
        F.count(F.lit(1)).alias("c"), F.max("rk").alias("mx"), F.min("rk").alias("mn")
    )
    bad = per_q.where((F.col("c") != K) | (F.col("mx") != K) | (F.col("mn") != 1)).count()
    assert bad == 0
    # distance monotone in rank
    w = Window.partitionBy("qid").orderBy("rk")
    viol = (
        edges.withColumn("_prev", F.lag("d").over(w))
        .where(F.col("_prev").isNotNull() & (F.col("d") < F.col("_prev")))
        .count()
    )
    assert viol == 0


def test_recall_on_planted_clusters(clustered):
    truth = brute_edges(clustered, K).select("qid", "nid")
    approx = knn_edges(clustered, k=K, dim=DIM).select("qid", "nid")
    hit = truth.join(approx, ["qid", "nid"]).count()
    recall = hit / truth.count()
    assert recall >= 0.95, f"planted-cluster recall {recall:.3f} < 0.95"


def test_near_duplicates_recall(clustered):
    # brute within-label pairs >= 0.995 cosine vs the banded path
    from sparkclean.sim.knn import cosine_col

    a = clustered.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"), "label"
    )
    b = clustered.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"), "label"
    )
    brute = (
        a.join(b, "label")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_col(F.col("_va"), F.col("_vb")))
        .where(F.col("cosine") >= 0.995)
        .select("id_a", "id_b")
    )
    approx = embedding_near_duplicates(clustered, threshold=0.995, dim=DIM).select(
        "id_a", "id_b"
    )
    n_true = brute.count()
    assert n_true > 0, "fixture must contain near-duplicate pairs"
    hit = brute.join(approx, ["id_a", "id_b"]).count()
    assert hit / n_true >= 0.95
    # and the banded path never invents pairs (precision is exact: every
    # candidate is verified against the true cosine)
    assert approx.join(brute, ["id_a", "id_b"], "left_anti").count() == 0


def test_lsh_topk_recall_vs_brute(clustered):
    """sim.knn.lsh_topk (OR-of-bands SRP blocking) recovers ≥0.9 of the
    exact brute-force cosine top-5 on the clustered fixture."""
    from sparkclean.sim.knn import cosine_topk, lsh_topk

    queries = clustered.where(F.col("vec_id") % 10 == 0)
    brute = cosine_topk(clustered, queries, k=5).select("query_id", "neighbor_id")
    approx = lsh_topk(clustered, queries, dim=DIM, k=5).select("query_id", "neighbor_id")
    n_true = brute.count()
    hit = brute.join(approx, ["query_id", "neighbor_id"]).count()
    assert n_true > 0
    assert hit / n_true >= 0.9, f"lsh_topk recall {hit / n_true:.3f} < 0.9"


def test_ivf_topk_recall_vs_brute(clustered):
    """sim.ivf.ivf_topk (deterministic-Lloyd IVF, n_probe cells) recovers
    ≥0.9 of the exact brute-force cosine top-5; its plan has no cartesian
    candidate join."""
    from sparkclean.sim.ivf import ivf_topk
    from sparkclean.sim.knn import cosine_topk

    queries = clustered.where(F.col("vec_id") % 10 == 0)
    brute = cosine_topk(clustered, queries, k=5).select("query_id", "neighbor_id")
    approx = ivf_topk(clustered, queries, dim=DIM, k=5)
    assert "CartesianProduct" not in approx._jdf.queryExecution().executedPlan().toString()
    approx = approx.select("query_id", "neighbor_id")
    n_true = brute.count()
    hit = brute.join(approx, ["query_id", "neighbor_id"]).count()
    assert n_true > 0
    assert hit / n_true >= 0.9, f"ivf_topk recall {hit / n_true:.3f} < 0.9"


def test_band_codes_udf_matches_catalyst_fold(clustered):
    """The Arrow band-code kernel is BIT-IDENTICAL to the Catalyst fold
    twin (the per-dimension sequential accumulation claim, verified)."""
    from pyspark.sql import functions as F

    from sparkclean.sim.knn import band_codes_col, band_codes_udf

    a = clustered.select(
        "vec_id", band_codes_col(F.col("embedding"), DIM).alias("codes")
    )
    b = clustered.select(
        "vec_id", band_codes_udf(DIM)(F.col("embedding")).alias("codes")
    )
    ca = {r["vec_id"]: list(r["codes"]) for r in a.collect()}
    cb = {r["vec_id"]: list(r["codes"]) for r in b.collect()}
    assert ca == cb


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_in_consumer_plans(clustered, spark):
    from sparkclean.quality.datalab import near_duplicate_issues
    from sparkclean.quality.valuation import knn_shapley_scores

    plans = {
        "knn_edges": _physical_plan(knn_edges(clustered, k=K, dim=DIM)),
        "near_duplicate_issues": _physical_plan(near_duplicate_issues(clustered)),
        "knn_shapley": _physical_plan(knn_shapley_scores(clustered)),
        "embedding_near_duplicates": _physical_plan(
            embedding_near_duplicates(clustered, threshold=0.9, dim=DIM)
        ),
    }
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, f"{name} plan has a cartesian product"
        # the scale path must be there: an equi-join keyed on the LSH
        # band/code columns (the consumer may re-reference the edge
        # subplan in several branches, so BNLJ rescue nodes can appear
        # more than once — but only ever downstream of this equi-join)
        assert "_band" in plan and "_code" in plan, (
            f"{name} lost the banded candidate equi-join"
        )
    # the builder itself contains exactly the one bounded rescue BNLJ
    assert plans["knn_edges"].count("BroadcastNestedLoopJoin") <= 1


def test_lsh_topk_external_query_vectors(spark):
    """Probe vectors NOT drawn from the indexed table must score against
    their OWN embeddings (round-3 review: the query vector was silently
    re-fetched from df by id, dropping external ids entirely)."""
    rng = np.random.RandomState(17)
    base = rng.randn(40, DIM)
    df = spark.createDataFrame(
        [(i, [float(v) for v in base[i]]) for i in range(40)],
        "vec_id: long, embedding: array<double>",
    )
    # external probes: ids far outside df's id space, vectors equal to
    # two existing rows (so their true top-1 is that row at cosine ~1)
    probes = spark.createDataFrame(
        [(1000, [float(v) for v in base[3]]), (1001, [float(v) for v in base[7]])],
        "vec_id: long, embedding: array<double>",
    )
    out = lsh_topk(df, probes, dim=DIM, k=3).collect()
    assert out, "external probes returned no candidates"
    top = {}
    for r in out:
        if r["rank"] == 1:
            top[r["query_id"]] = (r["neighbor_id"], r["cosine"])
    assert top[1000][0] == 3 and top[1000][1] == pytest.approx(1.0, abs=1e-6)
    assert top[1001][0] == 7 and top[1001][1] == pytest.approx(1.0, abs=1e-6)


def test_knn_edges_rejects_bad_metric_and_empty_df(spark):
    from sparkclean.sim.knn import pair_dist_udf

    with pytest.raises(ValueError, match="unknown metric"):
        pair_dist_udf(4, "euclidian")
    empty = spark.createDataFrame([], "vec_id: long, embedding: array<double>")
    with pytest.raises(ValueError, match="cannot infer dim"):
        knn_edges(empty, k=3)


def test_cosine_zero_norm_is_zero_in_all_three_routes(spark):
    """Zero-norm vectors define cosine = 0 (ANSI Spark would otherwise
    throw DIVIDE_BY_ZERO; DuckDB/NumPy would emit inf/nan) — the
    ties-zoo corpus found this live in knn_bruteforce."""
    import duckdb
    from pyspark.sql import functions as F

    from sparkclean.sim.knn import cosine_col, cosine_sql

    rows = [
        (0, [0.0, 0.0, 0.0], [1.0, 2.0, 2.0]),
        (1, [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "i: long, a: array<double>, b: array<double>")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", cosine_col(F.col("a"), F.col("b")).alias("c")).collect()
    }
    assert got == {0: 0.0, 1: 0.0, 2: 1.0}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, a DOUBLE[], b DOUBLE[])")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    want = dict(con.sql(f"SELECT i, {cosine_sql('a','b')} FROM t").fetchall())
    assert got == want
