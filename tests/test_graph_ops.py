"""Graph-derived managers: KNN-vote pred_probs (features-only label
manager) and eps-thresholded connected components (underperforming_group
from the graph)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkclean.quality.datalab import (
    knn_graph_clusters,
    knn_vote_pred_probs,
    label_issues_from_features,
    underperforming_group_from_graph,
)

K = 4


@pytest.fixture(scope="module")
def blobs(spark):
    """Three tight planted blobs (12, 8, 6 points) + 4 far-flung isolates;
    labels mostly follow the blob with a few planted flips."""
    rng = np.random.RandomState(5)
    rows = []
    # blob centers sit away from the origin: the banded-LSH candidate
    # hash takes hyperplane SIGNS, and a cluster straddling the origin
    # gets incoherent codes (documented recall edge; the DBSCAN core
    # rule, unlike the old closure, is sensitive to missing knn edges)
    centers = [(3.0, 3.0), (10.0, 10.0), (-10.0, 8.0)]
    sizes = [12, 8, 6]
    i = 0
    for b, ((cx, cy), n) in enumerate(zip(centers, sizes)):
        for _ in range(n):
            vec = [cx + rng.uniform(-0.3, 0.3), cy + rng.uniform(-0.3, 0.3)]
            label = b if i % 7 else (b + 1) % K  # planted flips
            rows.append((i, [float(v) for v in vec] + [0.0, 0.0], label))
            i += 1
    for j in range(4):
        rows.append((i, [100.0 + 30 * j, -100.0, 0.0, 0.0], 3))
        i += 1
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>, label: int"
    ).cache()


def test_knn_graph_clusters_recovers_blobs(blobs):
    out = {r["vec_id"]: r["cluster_id"]
           for r in knn_graph_clusters(blobs, eps=2.0, k=5).collect()}
    # blob members share a component labeled by the min member id
    assert {out[i] for i in range(12)} == {0}
    assert {out[i] for i in range(12, 20)} == {12}
    assert {out[i] for i in range(20, 26)} == {20}
    # isolates are DBSCAN-style noise
    assert all(out[i] == -1 for i in range(26, 30))


def test_knn_vote_pred_probs_matches_reference_formula(blobs):
    """pred_probs[j] must equal the vote fraction over the k graph
    neighbors — the (k+1)-NN-including-self posterior minus the self
    vote, rescaled by (k+1)/k (label.py:148-160).  The replay votes over
    the SAME knn_edges graph the operator consumes (graph recall is
    covered by the dedicated knn recall tests), so this isolates the
    vote/posterior construction."""
    from sparkclean.sim.knn import knn_edges

    k = 5
    got = {
        r["vec_id"]: list(r["pred_probs"])
        for r in knn_vote_pred_probs(blobs, K, k=k).collect()
    }
    y = {r["vec_id"]: r["label"] for r in blobs.select("vec_id", "label").collect()}
    edges = knn_edges(blobs, k=k, metric="euclidean").collect()
    nbrs: dict[int, list[int]] = {}
    for r in edges:
        nbrs.setdefault(r["qid"], []).append(r["nid"])
    assert set(nbrs) == set(y)
    for q, ns in nbrs.items():
        assert len(ns) == k
        want = [sum(1 for j in ns if y[j] == c) / k for c in range(K)]
        assert got[q] == pytest.approx(want, abs=1e-12)
    # every posterior row sums to 1
    assert all(abs(sum(p) - 1.0) < 1e-12 for p in got.values())


def test_label_issues_from_features_flags_planted_flips(blobs):
    out = label_issues_from_features(blobs, K, k=5)
    flagged = {r["vec_id"] for r in out.where(F.col("is_label_issue")).collect()}
    planted = {i for i in range(26) if i % 7 == 0}
    # the planted flips inside tight blobs are exactly what KNN voting
    # disagrees with; require a clear majority of them caught
    assert len(flagged & planted) >= len(planted) - 1
    assert out.count() == blobs.count()


def test_underperforming_group_from_graph_runs_and_scores(blobs):
    df = blobs.withColumn(
        "pred_probs",
        F.transform(
            F.sequence(F.lit(0), F.lit(K - 1)),
            lambda j: F.when(j == F.col("label"), F.lit(0.7)).otherwise(
                F.lit(0.1)
            ),
        ),
    )
    out = underperforming_group_from_graph(df, eps=2.0, k=5)
    rows = out.collect()
    assert len(rows) == df.count()
    by_id = {r["vec_id"]: r for r in rows}
    # isolates carry the noise cluster and default score 1.0
    assert by_id[27]["cluster_id"] == -1
    assert by_id[27]["underperforming_group_score"] == 1.0
    # scores are ratios in (0, 1]
    assert all(0.0 < r["underperforming_group_score"] <= 1.0 for r in rows)


def test_find_issues_features_only_entry(blobs):
    """Datalab.find_issues(features=...) parity: no pred_probs column +
    vec_col → the KNN-vote posterior is derived automatically and every
    manager runs; missing both raises."""
    from sparkclean.quality.datalab import find_issues

    issues, summary = find_issues(
        blobs, K, id_col="vec_id", vec_col="embedding"
    )
    rows = issues.collect()
    assert len(rows) == blobs.count()
    cols = set(issues.columns)
    assert {"is_label_issue", "label_score", "outlier_score"} <= cols
    assert summary.count() >= 2
    with pytest.raises(ValueError, match="feature column"):
        find_issues(blobs.drop("embedding"), K, id_col="vec_id")


def _line_edges(spark, xs, k):
    """Exact knn edge list (qid, nid, d, rk) for 1-D points, brute force."""
    xs = np.asarray(xs, dtype=float)
    rows = []
    for i, x in enumerate(xs):
        d = np.abs(xs - x)
        d[i] = np.inf
        order = np.lexsort((np.arange(len(xs)), d))[:k]
        for rk, j in enumerate(order, start=1):
            rows.append((i, int(j), float(d[j]), rk))
    return spark.createDataFrame(rows, "qid: long, nid: long, d: double, rk: int")


def _line_df(spark, xs):
    return spark.createDataFrame(
        [(i, [float(x), 0.0]) for i, x in enumerate(xs)],
        "vec_id: long, embedding: array<double>",
    )


def test_dbscan_bridge_no_longer_merges(spark):
    """The closure-vs-DBSCAN divergence fixture: two 6-point line blobs
    joined only through a non-core bridge.  The old transitive closure
    merged them through the bridge's OWN knn row; DBSCAN keeps two
    clusters, and the bridge — seen by no core's row — is noise."""
    xs = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 4.5, 4.6, 4.7, 4.8, 4.9, 5.0, 2.5]
    df, edges = _line_df(spark, xs), _line_edges(spark, xs, k=5)
    for cap in (0, 10**6):  # distributed path and driver union-find path
        out = {
            r["vec_id"]: r["cluster_id"]
            for r in knn_graph_clusters(
                df, eps=2.05, k=5, edges_df=edges, small_graph_edges=cap
            ).collect()
        }
        assert {out[i] for i in range(6)} == {0}, (cap, out)
        assert {out[i] for i in range(6, 12)} == {6}, (cap, out)
        assert out[12] == -1, (cap, out)


def test_dbscan_border_and_noise(spark):
    """Core/border/noise trichotomy with k=3, min_samples=3: the chain
    0..3 plus outpost 4 are core; 5 is non-core but appears in core 4's
    row within eps -> border of cluster 0; 6 sees others but is seen by
    no core -> noise (the reference's asymmetric-reach behavior)."""
    xs = [0.0, 0.1, 0.2, 0.3, 0.8, 1.35, 2.2]
    df, edges = _line_df(spark, xs), _line_edges(spark, xs, k=3)
    want = {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 6: -1}
    for cap in (0, 10**6):
        out = {
            r["vec_id"]: r["cluster_id"]
            for r in knn_graph_clusters(
                df, eps=0.7, k=3, edges_df=edges,
                min_samples=3, small_graph_edges=cap,
            ).collect()
        }
        assert out == want, (cap, out)


def test_giant_component_star_contraction_logarithmic(spark):
    """Round-5 planted-skew stress (VERDICT item 6): ONE giant component
    mixing the two adversarial shapes — a 2^14-node path (diameter 2^14,
    the propagation worst case) and a 2^13-leaf star (the hot-node
    worst case), linked together.  The alternating large/small-star
    contraction must label it as a single component within ~log2(n)
    rounds; the round-1..4 label-propagation loop crawled the path tail
    hop-by-hop and tripled per-round cost past ~18 rounds (lazy
    checkpoint lineage)."""
    import math

    from pyspark.sql import Window

    from sparkclean.graph import component_labels

    n = 2**14
    perm = spark.range(n).select(
        F.col("id"),
        F.row_number().over(Window.orderBy(F.xxhash64("id"))).alias("pos"),
    )
    a = perm.select(F.col("id").alias("id_a"), F.col("pos").alias("p"))
    b = perm.select(F.col("id").alias("id_b"), (F.col("pos") - 1).alias("p"))
    path = a.join(b, "p").select("id_a", "id_b")
    hub = n + 1
    star = spark.range(n + 2, n + 2 + n // 2).select(
        F.lit(hub).alias("id_a"), F.col("id").alias("id_b")
    )
    link = spark.createDataFrame([(0, hub)], "id_a long, id_b long")
    pairs = path.unionByName(star).unionByName(link)

    rounds: list = []
    comp = component_labels(pairs, max_iter=30, rounds_out=rounds)
    agg = comp.agg(
        F.countDistinct("comp").alias("nc"),
        F.count(F.lit(1)).alias("n"),
        F.min("comp").alias("mn"),
    ).collect()[0]
    assert agg["n"] == n + 1 + n // 2  # path nodes + hub + leaves
    assert agg["nc"] == 1 and agg["mn"] == 0
    assert rounds and rounds[0] <= math.ceil(math.log2(n)) + 3, rounds
    spark.catalog.clearCache()


def test_star_contraction_random_graph_matches_union_find(spark):
    """Seeded random graph (several components, cycles, isolated pairs):
    component_labels must agree exactly with a driver union-find oracle
    on min-id component labels."""
    import numpy as np

    from sparkclean.graph import component_labels

    rng = np.random.RandomState(17)
    n = 200
    edges = [(int(a), int(b)) for a, b in rng.randint(0, n, size=(150, 2)) if a != b]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = sorted({v for e in edges for v in e})
    want = {v: find(v) for v in touched}
    # union-find roots are not necessarily component minima; normalise
    by_root = {}
    for v in touched:
        by_root.setdefault(find(v), []).append(v)
    root_min = {r: min(vs) for r, vs in by_root.items()}
    want = {v: root_min[find(v)] for v in touched}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in component_labels(df).collect()}
    assert got == want
    spark.catalog.clearCache()
