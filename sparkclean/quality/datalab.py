"""Datalab-style issue audit: run every applicable issue manager over one
DataFrame, emit a wide per-row issue table + per-dataset summary.

Mirrors Datalab.find_issues → IssueFinder → manager loop
(datalab/internal/issue_finder.py:232-314), but the managers are
independent column pipelines over one cached DataFrame — Catalyst fuses
the projections, and expensive shared state (thresholds, phash clusters)
is computed once.

Managers implemented (registry analog of issue_manager_factory.py:47-74):
  label, outlier, near_duplicate, class_imbalance, null,
  underperforming_group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .issues import find_label_issues
from .ood import with_ood_scores
from .scores import self_confidence
from .thresholds import get_confident_thresholds

IMBALANCE_THRESHOLD_FACTOR = 0.1  # issue if p_rarest < 0.1 / K (imbalance.py:36)
UNDERPERFORMING_RATIO = 0.1  # worst cluster ratio threshold (underperforming_group.py)


def class_imbalance_issues(
    df: DataFrame, num_classes: int, label_col: str = "label"
) -> DataFrame:
    """Per-row: is_class_imbalance_issue + score (imbalance.py:13-78 —
    score = rarest-class prior for rows of the rarest class, else 1)."""
    total = df.count()
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("_n"))
    rarest = counts.orderBy(F.col("_n").asc(), F.col(label_col).asc()).first()
    p_rarest = rarest["_n"] / total
    is_issue_class = p_rarest < IMBALANCE_THRESHOLD_FACTOR / num_classes
    return df.withColumn(
        "class_imbalance_score",
        F.when(F.col(label_col) == rarest[label_col], F.lit(float(p_rarest))).otherwise(
            F.lit(1.0)
        ),
    ).withColumn(
        "is_class_imbalance_issue",
        (F.col(label_col) == rarest[label_col]) & F.lit(bool(is_issue_class)),
    )


def null_issues(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-row: fraction of non-null fields; issue if ALL tracked columns
    are null (null.py:15-210)."""
    non_null = sum(
        [F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in cols], F.lit(0)
    )
    return df.withColumn(
        "null_score", non_null.cast("double") / F.lit(float(len(cols)))
    ).withColumn("is_null_issue", non_null == 0)


def underperforming_group_issues(
    df: DataFrame,
    num_classes: int,
    cluster_col: str,
    label_col: str = "label",
    probs_col: str = "pred_probs",
) -> DataFrame:
    """Worst cluster by mean self-confidence; issue if its mean falls
    below UNDERPERFORMING_RATIO × overall mean
    (underperforming_group.py:25-345; clusters for our corpus are
    phash/langid buckets rather than DBSCAN over a KNN graph)."""
    scored = df.withColumn("_sc", self_confidence(F.col(label_col), F.col(probs_col)))
    overall = scored.agg(F.avg("_sc")).collect()[0][0] or 0.0
    by_cluster = scored.groupBy(cluster_col).agg(F.avg("_sc").alias("_cluster_mean"))
    worst = by_cluster.orderBy(F.col("_cluster_mean").asc(), F.col(cluster_col).asc()).first()
    ratio = (worst["_cluster_mean"] / overall) if overall > 0 else 1.0
    flagged = bool(ratio < UNDERPERFORMING_RATIO)
    return (
        scored.join(F.broadcast(by_cluster), cluster_col, "left")
        .withColumn(
            "underperforming_group_score",
            F.when(
                F.col(cluster_col) == worst[cluster_col], F.lit(float(min(ratio, 1.0)))
            ).otherwise(F.lit(1.0)),
        )
        .withColumn(
            "is_underperforming_group_issue",
            (F.col(cluster_col) == worst[cluster_col]) & F.lit(flagged),
        )
        .drop("_sc", "_cluster_mean")
    )


def knn_vote_pred_probs(
    df: DataFrame,
    num_classes: int,
    k: int = 10,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    metric: str = "euclidean",
) -> DataFrame:
    """Out-of-sample pred_probs from features alone — the reference's
    features-only label-manager entry point (issue_manager/label.py:148-160):
    KNeighborsClassifier(k+1).predict_proba on the training set, minus the
    self vote, rescaled by (k+1)/k.  Removing the self vote from the k+1
    neighbor set (which contains the query itself at distance 0) leaves
    exactly the k nearest OTHER points, so

        pred_probs[j] = #{k nearest non-self neighbors with label j} / k

    which is one groupBy over the shared bucketed :func:`knn_edges` graph
    (no cartesian join; distance ties break on (d, id), the repo-wide
    documented tie order where sklearn is index-order).
    Returns (id, label, pred_probs) for every input row.
    """
    from ..sim.knn import knn_edges

    edges = knn_edges(df, k=k, id_col=id_col, vec_col=vec_col, metric=metric)
    nl = df.select(F.col(id_col).alias("nid"), F.col(label_col).alias("_nl"))
    votes = edges.join(nl, "nid").groupBy("qid").agg(
        *[
            (F.sum((F.col("_nl") == j).cast("int")) / F.lit(float(k))).alias(f"_p{j}")
            for j in range(num_classes)
        ]
    )
    pp = votes.select(
        F.col("qid").alias(id_col),
        F.array(*[F.col(f"_p{j}") for j in range(num_classes)]).alias("pred_probs"),
    )
    # LEFT join + all-zero posterior for edge-less rows — mirrors the
    # DuckDB twin's LEFT JOIN/coalesce so a vote-less qid (single-row
    # table, future knn changes) yields p=[0,…,0] instead of vanishing
    zeros = F.array(*[F.lit(0.0) for _ in range(num_classes)])
    return (
        df.select(id_col, label_col)
        .join(pp, id_col, "left")
        .withColumn("pred_probs", F.coalesce(F.col("pred_probs"), zeros))
    )


def label_issues_from_features(
    df: DataFrame,
    num_classes: int,
    k: int = 10,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    filter_by: str = "prune_by_noise_rate",
) -> DataFrame:
    """Features-only label manager: KNN-vote posterior →
    find_label_issues → self-confidence quality score, mirroring the
    reference's LabelIssueManager when only features are supplied
    (label.py:148-170).  Returns (id, is_label_issue, label_score)."""
    # the issues chain fans out into ~6 jobs (thresholds, joint,
    # calibration, prune ranks) — pin the narrow (id, label, K-array)
    # posterior once instead of re-running the knn vote per job
    pp = knn_vote_pred_probs(
        df, num_classes, k=k, id_col=id_col, label_col=label_col, vec_col=vec_col
    ).persist()
    out = find_label_issues(
        pp, num_classes, id_col=id_col, label_col=label_col, filter_by=filter_by
    )
    return out.select(
        id_col,
        "is_label_issue",
        F.round(
            self_confidence(F.col(label_col), F.col("pred_probs")), 6
        ).alias("label_score"),
    )


#: DBSCAN defaults mirrored from sklearn (the reference instantiates
#: DBSCAN(metric="precomputed") with default min_samples=5,
#: underperforming_group.py:135-155)
DBSCAN_MIN_SAMPLES = 5
#: collect-and-union-find cutoff: within-eps directed edge lists up to
#: this many rows resolve on the driver in one job (an id-pair list of
#: 5M rows is ~80 MB — the same order as a broadcast-join threshold);
#: larger graphs run the distributed pointer-jumping rounds
SMALL_GRAPH_EDGE_LIMIT = 5_000_000


def _dbscan_labels_driver(edge_rows, min_samples: int) -> list[tuple[int, int]]:
    """Driver-side DBSCAN-over-knn-graph on a collected directed edge
    list [(qid, nid)] — union-find over core-core pairs, then border
    attach.  Pure python; bounded by SMALL_GRAPH_EDGE_LIMIT rows."""
    deg: dict[int, int] = {}
    for q, _ in edge_rows:
        deg[q] = deg.get(q, 0) + 1
    core = {q for q, c in deg.items() if c >= min_samples}
    parent = {i: i for i in core}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for q, n in edge_rows:
        if q in core and n in core:
            ra, rb = find(q), find(n)
            if ra != rb:
                parent[ra] = rb
    members: dict[int, list[int]] = {}
    for i in core:
        members.setdefault(find(i), []).append(i)
    label = {}
    for mem in members.values():
        lab = min(mem)
        for i in mem:
            label[i] = lab
    border: dict[int, int] = {}
    for q, n in edge_rows:
        if q in core and n not in core:
            lab = label[q]
            if n not in border or lab < border[n]:
                border[n] = lab
    out = [(int(i), int(c)) for i, c in label.items()]
    out += [(int(i), int(c)) for i, c in border.items()]
    return out


def knn_graph_clusters(
    df: DataFrame,
    eps: float,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
    edges_df: DataFrame | None = None,
    min_samples: int = DBSCAN_MIN_SAMPLES,
    small_graph_edges: int = SMALL_GRAPH_EDGE_LIMIT,
) -> DataFrame:
    """DBSCAN over the eps-thresholded KNN graph — the distributed
    analog of the reference's DBSCAN(metric="precomputed") on the
    sparse knn_graph (underperforming_group.py:135-155), with the
    core/border/noise distinction:

    * **core** — a point whose OWN knn row has ≥ ``min_samples``
      within-eps neighbors (sklearn counts row-i entries of the csr
      graph; the point itself is not an entry);
    * clusters = connected components over core-core pairs adjacent in
      EITHER direction (expansion from a core reaches any core in its
      row, which then expands symmetrically), labeled min core-member
      id;
    * **border** — a non-core point j appearing in some core i's row
      within eps; j attaches to the min cluster id over such i
      (documented tie-break: sklearn's assignment is scan-order
      dependent when multiple clusters reach j);
    * everything else is **noise** (-1) — including a non-core point
      whose own row sees cores that do not see it back (the reference's
      asymmetric-reach behavior).

    Strategy is size-adaptive, like a broadcast-vs-shuffle join choice:
    the within-eps directed edge list is counted once; at or below
    ``small_graph_edges`` rows it is collected and resolved with driver
    union-find (one job instead of O(log diameter) rounds), otherwise
    min-label propagation with pointer-jumping runs over the CORE-CORE
    edges — each round one equi-join + groupBy, lineage truncated with
    localCheckpoint, O(log diameter) rounds, ``max_iter`` backstop.
    Both paths implement the identical deterministic spec (asserted by
    tests on the same inputs)."""
    if edges_df is None:
        from ..sim.knn import knn_edges

        edges_df = knn_edges(df, k=k, id_col=id_col, vec_col=vec_col, metric="euclidean")
    ew = (
        edges_df.where(F.col("d") <= F.lit(float(eps)))
        .select(F.col("qid").alias("src"), F.col("nid").alias("dst"))
        .persist()
    )
    nodes = df.select(F.col(id_col).alias("id"))
    n_edges = ew.count()
    spark = df.sparkSession

    if n_edges <= small_graph_edges:
        pairs = [(r["src"], r["dst"]) for r in ew.collect()]
        ew.unpersist()
        labeled = _dbscan_labels_driver(pairs, min_samples)
        if labeled:
            comp_df = spark.createDataFrame(labeled, "id: long, cluster_id: long")
        else:
            comp_df = spark.createDataFrame([], "id: long, cluster_id: long")
        return (
            nodes.join(F.broadcast(comp_df), "id", "left")
            .select(
                F.col("id").alias(id_col),
                F.coalesce("cluster_id", F.lit(-1)).cast("long").alias("cluster_id"),
            )
        )

    deg = ew.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("_deg"))
    core = deg.where(F.col("_deg") >= min_samples).select("id").persist()
    # core-core edges, symmetric closure (adjacency in either direction)
    cc_half = (
        ew.join(core.select(F.col("id").alias("src")), "src")
        .join(core.select(F.col("id").alias("dst")), "dst")
        .select("src", "dst")
    )
    edges = cc_half.unionByName(
        cc_half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()

    comp = core.withColumn("comp", F.col("id")).localCheckpoint()
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            edges.join(comp.select(F.col("id").alias("dst"), "comp"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("comp").alias("_nc"))
        )
        stepped = (
            comp.join(nbr_min, "id", "left")
            .select("id", F.least(F.col("comp"), F.coalesce("_nc", "comp")).alias("comp"))
            .localCheckpoint(eager=False)  # consumed by BOTH sides of the
            # jump join — without this the edges-join propagation runs
            # twice per round; lazy, so materialization folds into the
            # round's first action instead of an extra up-front job
        )
        # pointer jump: comp <- comp[comp] (roots resolve transitively)
        jumped = (
            stepped.alias("a")
            .join(
                stepped.select(
                    F.col("id").alias("comp"), F.col("comp").alias("_root")
                ).alias("b"),
                "comp",
                "left",
            )
            .select("id", F.coalesce("_root", "comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        # convergence: per-node comp values only ever DECREASE, so the
        # total is strictly decreasing until the fixpoint — one narrow
        # agg on the checkpointed frame instead of a join-and-count.
        # decimal(38,0) keeps the sum exact at any id range (a long sum
        # would overflow ANSI mode at 10^12 rows × 10^12-scale ids)
        csum = jumped.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]
        comp = jumped
        if prev_sum is not None and csum == prev_sum:
            break
        prev_sum = csum
    # border: non-core dst reached from a core src's row — min cluster id
    border = (
        ew.join(comp.select(F.col("id").alias("src"), "comp"), "src")
        .join(core.select(F.col("id").alias("dst")), "dst", "left_anti")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("comp").alias("comp"))
    )
    # NOTE: ew/core/edges stay persisted — the returned DataFrame reads
    # them lazily; an unpersist here would silently rebuild the knn
    # filter at execution time.  Batch drivers clear caches per query.
    assigned = comp.unionByName(border)
    return (
        nodes.join(assigned, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("comp", F.lit(-1)).cast("long").alias("cluster_id"),
        )
    )


def underperforming_group_from_graph(
    df: DataFrame,
    eps: float | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    label_col: str = "label",
    probs_col: str = "pred_probs",
    vec_col: str = "embedding",
    min_cluster_samples: int = 5,
    threshold: float = UNDERPERFORMING_RATIO,
) -> DataFrame:
    """underperforming_group with clusters DERIVED from the feature
    space, reproducing the reference's DBSCAN-over-knn-graph flow
    (underperforming_group.py:79-230) instead of a caller-supplied
    cluster column:

    * clusters = DBSCAN over the eps-thresholded knn graph with the
      core/border/noise distinction (see :func:`knn_graph_clusters`;
      eps defaults to the exact median nearest-neighbor distance);
    * noise (-1) and clusters below ``min_cluster_samples`` are excluded
      (filter_cluster_ids), and mean performance is computed over the
      REMAINING rows only;
    * every cluster whose mean self-confidence falls below the filtered
      mean scores ratio = cluster_mean / mean (others 1.0), and the
      worst cluster is flagged iff its ratio < threshold — per-cluster
      scores exactly as get_underperforming_clusters assigns them.

    Returns (id, cluster_id, underperforming_group_score,
    is_underperforming_group_issue)."""
    from ..sim.knn import knn_edges

    edges_all = knn_edges(
        df, k=k, id_col=id_col, vec_col=vec_col, metric="euclidean"
    ).persist()  # shared by the eps median and every clustering round
    if eps is None:
        from ..stats import exact_median

        nn = edges_all.where(F.col("rk") == 1).select(F.col("d").alias("_nnd"))
        eps = float(exact_median(nn, "_nnd"))

    clusters = knn_graph_clusters(
        df, eps, k=k, id_col=id_col, vec_col=vec_col, edges_df=edges_all
    )
    scored = (
        df.select(id_col, label_col, probs_col)
        .join(clusters, id_col)
        .withColumn("_sc", self_confidence(F.col(label_col), F.col(probs_col)))
    )
    sizes = scored.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("_n"))
    valid = sizes.where(
        (F.col("cluster_id") >= 0) & (F.col("_n") >= min_cluster_samples)
    ).select("cluster_id")
    kept = scored.join(F.broadcast(valid), "cluster_id")
    mean_perf = kept.agg(F.avg("_sc")).collect()[0][0]
    if mean_perf is None:
        # no valid clusters → reference reports all-ok (find_issues early
        # return when unique_cluster_ids is empty)
        return scored.select(
            id_col,
            "cluster_id",
            F.lit(1.0).alias("underperforming_group_score"),
            F.lit(False).alias("is_underperforming_group_issue"),
        )
    by_cluster = (
        kept.groupBy("cluster_id")
        .agg(F.avg("_sc").alias("_cm"))
        .withColumn("_ratio", F.col("_cm") / F.lit(float(mean_perf)))
        .where(F.col("_ratio") < 1.0)
    )
    worst = by_cluster.orderBy(F.col("_ratio").asc(), F.col("cluster_id").asc()).first()
    worst_id = worst["cluster_id"] if worst and worst["_ratio"] < threshold else None
    return (
        scored.join(F.broadcast(by_cluster), "cluster_id", "left")
        .select(
            id_col,
            "cluster_id",
            F.round(F.coalesce("_ratio", F.lit(1.0)), 6).alias(
                "underperforming_group_score"
            ),
            (
                F.col("cluster_id") == F.lit(worst_id)
                if worst_id is not None
                else F.lit(False)
            ).alias("is_underperforming_group_issue"),
        )
    )


def _gnb_correct_udf(M, A, B, C, classes: list[int]):
    """Arrow kernel: per-row leave-fold-out 1-D GNB argmax correctness.

    ``M/A/B/C`` are (n_folds, n_classes) literal-stat arrays (mean, 2v,
    0.5·ln(2πv), ln(n/nf)); the kernel evaluates
    ``ll_j = -(x-M)·(x-M)/A - B + C`` per class in ``classes`` order and
    tracks the argmax with the same strict-greater update as the
    when-chain it replaces (first class wins ties).  Returns 1.0/0.0 for
    predicted == given label, ready for ``avg``."""
    from pyspark.sql.functions import pandas_udf

    Mc, Ac, Bc, Cc = (np.ascontiguousarray(x, dtype=np.float64) for x in (M, A, B, C))
    ks = np.asarray(classes, dtype=np.int64)

    @pandas_udf("double")
    def fn(x: pd.Series, fold: pd.Series, label: pd.Series) -> pd.Series:
        # NULL tolerance of the when-chain this kernel replaced: a NULL
        # feature/fold/label row yields a NULL correctness (F.avg skips
        # it) instead of crashing the int cast
        valid = (x.notna() & fold.notna() & label.notna()).to_numpy()
        xv = x.to_numpy(dtype=np.float64, na_value=0.0)
        fv = fold.fillna(0).to_numpy(dtype=np.int64)
        lv = label.fillna(ks[0]).to_numpy(dtype=np.int64)
        pred = np.full(len(xv), ks[0], dtype=np.int64)
        best = None
        for j in range(len(ks)):
            d = xv - Mc[fv, j]
            ll = -(d * d) / Ac[fv, j] - Bc[fv, j] + Cc[fv, j]
            if best is None:
                best = ll
            else:
                upd = ll > best
                pred[upd] = ks[j]
                best = np.where(upd, ll, best)
        res = pd.array((pred == lv).astype(np.float64), dtype="Float64")
        res[~valid] = pd.NA
        return pd.Series(res)

    return fn


def spurious_correlation_scores(
    df: DataFrame,
    property_cols: list[str],
    label_col: str = "label",
    id_col: str = "id",
    n_folds: int = 5,
) -> DataFrame:
    """Per image-property spurious-correlation score
    (datalab/internal/spurious_correlation.py:13-113).

    For each property: a 1-D Gaussian-per-class classifier evaluated
    with ``n_folds``-fold cross-validation exactly like the reference's
    ``cross_val_score(GaussianNB(), cv=5)`` (spurious_correlation.py:
    77-81) — stratified deterministic folds, leave-fold-out class
    means/variances/priors, out-of-sample accuracy.  With equal fold
    sizes the pooled accuracy equals the reference's mean-of-fold
    accuracies.  Score = ``min(1, (1-acc)/(1-acc_base))`` vs the
    majority-class baseline; low score ⇒ the property alone predicts
    the label ⇒ suspicious shortcut.
    """
    import math

    from .cv import with_cv_fold

    # THREE driver round-trips total, independent of the property count:
    # class counts (baseline), one shared (fold, class) moment pass for
    # every property, one fused accuracy agg — at gate scale each action
    # re-pays plan analysis of the fold CASE-trees, so the action count
    # is the operator's latency
    lab_counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("_c")).collect()
    total = sum(r["_c"] for r in lab_counts)
    base_acc = max(r["_c"] for r in lab_counts) / total
    folded = with_cv_fold(df, id_col, label_col, n_folds).persist()
    cell_aggs = [F.count(F.lit(1)).alias("_n")]
    for prop in property_cols:
        cell_aggs += [
            F.sum(F.col(prop)).alias(f"_s_{prop}"),
            F.sum(F.col(prop) * F.col(prop)).alias(f"_q_{prop}"),
        ]
    cell_rows = folded.groupBy("_fold", label_col).agg(*cell_aggs).collect()

    acc_aggs = []
    for prop in property_cols:
        cells = {
            (r["_fold"], r[label_col]): (r["_n"], r[f"_s_{prop}"], r[f"_q_{prop}"])
            for r in cell_rows
        }
        classes = sorted({k for _, k in cells})
        tot = {k: [0.0, 0.0, 0.0] for k in classes}
        for (_, k), (n, s, q) in cells.items():
            tot[k][0] += n
            tot[k][1] += s
            tot[k][2] += q

        # leave-fold-out stats per (fold, class): n, mean, var, prior
        def lofo(f: int, k: int):
            r = cells.get((f, k))
            n = max(tot[k][0] - (r[0] if r else 0.0), 1.0)
            s = tot[k][1] - (r[1] if r else 0.0)
            q = tot[k][2] - (r[2] if r else 0.0)
            m = s / n
            v = max(q / n - m * m, 1e-12)
            return n, m, v

        # ll_k(x) = -(x-m)^2 / (2v) - 0.5·ln(2πv) + ln(n/nf), evaluated
        # per (fold, class) — an Arrow kernel, not a fold×class CASE
        # chain: the ~1000-node literal tree costs seconds of
        # analysis+codegen PER JOB (constant in data size; the r3 cv
        # lesson).  Same left-assoc arithmetic, same strict-> argmax
        # update as the when-chain it replaces; fl((x-m)·(x-m)) is the
        # correctly-rounded square both engines' pow(x, 2) computes.
        M = np.zeros((n_folds, len(classes)))
        A = np.zeros_like(M)  # 2v
        B = np.zeros_like(M)  # 0.5·ln(2πv)
        C = np.zeros_like(M)  # ln(n/nf)
        for f in range(n_folds):
            stats_f = {k: lofo(f, k) for k in classes}
            nf = sum(s[0] for s in stats_f.values())
            for j, k in enumerate(classes):
                n, m, v = stats_f[k]
                M[f, j] = m
                A[f, j] = 2.0 * v
                B[f, j] = 0.5 * math.log(2 * math.pi * v)
                C[f, j] = math.log(n / nf)
        acc_aggs.append(
            F.avg(
                _gnb_correct_udf(M, A, B, C, [int(k) for k in classes])(
                    F.col(prop).cast("double"),
                    F.col("_fold").cast("int"),
                    F.col(label_col).cast("int"),
                )
            ).alias(f"_acc_{prop}")
        )
    arow = folded.agg(*acc_aggs).first()
    rows = []
    for prop in property_cols:
        acc = float(arow[f"_acc_{prop}"])
        score = min(1.0, (1.0 - acc) / max(1.0 - base_acc, 1e-12))
        rows.append((prop, float(round(acc, 6)), float(round(score, 6))))
    folded.unpersist()
    return df.sparkSession.createDataFrame(
        rows, "property: string, classifier_accuracy: double, spurious_score: double"
    )


def find_issues(
    df: DataFrame,
    num_classes: int,
    id_col: str = "id",
    label_col: str = "label",
    probs_col: str = "pred_probs",
    cluster_col: str | None = None,
    null_cols: list[str] | None = None,
    exact_quantile: bool = False,
    vec_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run all applicable managers; returns (issues_df, issue_summary).

    issues_df: one row per example with is_<name>_issue / <name>_score
    columns (data_issues.py column-join analog).  issue_summary: one row
    per issue type with num_issues + mean score.

    Features-only entry point (reference Datalab.find_issues(features=…)
    without pred_probs, issue_manager/label.py:148-160): when the probs
    column is absent and ``vec_col`` names a feature column, the
    out-of-sample posterior is derived as the KNN-vote fraction over the
    shared knn_edges graph before the managers run.
    """
    if probs_col not in df.columns:
        if vec_col is None or vec_col not in df.columns:
            raise ValueError(
                f"find_issues needs {probs_col!r} or a feature column "
                "(vec_col) to derive it from"
            )
        pp = knn_vote_pred_probs(
            df, num_classes, id_col=id_col, label_col=label_col, vec_col=vec_col
        ).select(id_col, F.col("pred_probs").alias(probs_col))
        df = df.join(pp, id_col)
    df = df.persist()
    thresholds = get_confident_thresholds(df, num_classes, label_col, probs_col)

    out = find_label_issues(
        df, num_classes, id_col, label_col, probs_col,
        filter_by="confident_learning", thresholds=thresholds,
    ).withColumnRenamed("is_label_issue", "is_label_issue")
    out = out.withColumn(
        "label_score", self_confidence(F.col(label_col), F.col(probs_col))
    )

    out = with_ood_scores(out, num_classes, probs_col, method="entropy", out_col="outlier_score")
    # outlier threshold: flag the bottom decile of the score distribution
    if exact_quantile:
        # exact interpolated decile via the approxQuantile band trick —
        # same value as percentile(outlier_score, 0.1) with no exact
        # Percentile aggregate (single-reducer O(distinct) buffer) in plan
        from ..stats import exact_quantile as _exact_q

        thr = _exact_q(out, "outlier_score", 0.1)
    else:
        thr = out.approxQuantile("outlier_score", [0.1], 0.001)[0]
    out = out.withColumn("is_outlier_issue", F.col("outlier_score") < F.lit(thr))

    out = class_imbalance_issues(out, num_classes, label_col)
    if null_cols:
        out = null_issues(out, null_cols)
    if cluster_col is not None:
        out = underperforming_group_issues(out, num_classes, cluster_col, label_col, probs_col)

    issue_types = [c[3:-6] for c in out.columns if c.startswith("is_") and c.endswith("_issue")]
    # ONE combined aggregation for every issue type (the per-type loop
    # ran one Spark job per type, each re-executing the full `out`
    # lineage — only the input df was persisted); values are identical:
    # same sum/avg expressions, evaluated in one pass
    aggs = []
    for t in issue_types:
        aggs.append(
            F.sum(F.when(F.col(f"is_{t}_issue"), 1).otherwise(0)).alias(f"_n_{t}")
        )
        aggs.append(
            F.avg(
                F.col(f"{t}_score") if f"{t}_score" in out.columns else F.lit(None)
            ).alias(f"_s_{t}")
        )
    row = out.agg(*aggs).collect()[0]
    summary_rows = [
        (
            t,
            int(row[f"_n_{t}"] or 0),
            float(row[f"_s_{t}"]) if row[f"_s_{t}"] is not None else None,
        )
        for t in issue_types
    ]
    summary = df.sparkSession.createDataFrame(
        summary_rows, "issue_type: string, num_issues: long, overall_score: double"
    )
    return out, summary


def frame_fingerprint(df: DataFrame, cols: list[str] | None = None) -> int:
    """Order-independent dataset fingerprint: sum of per-row xxhash64
    over the (sorted) column set, one narrow aggregation.  The Spark
    analog of the reference's dataset hash used by ``Datalab.load`` to
    refuse a lab whose data changed underneath it
    (datalab/internal/data.py hash + datalab.py:602-640)."""
    cols = sorted(cols or df.columns)
    h = df.agg(
        F.sum(F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")).alias("h")
    ).collect()[0]["h"]
    return int(h or 0)


def save_datalab(
    issues_df: DataFrame,
    summary_df: DataFrame,
    path: str,
    force: bool = False,
    data: DataFrame | None = None,
    info: dict | None = None,
    id_col: str = "id",
    num_classes: int | None = None,
) -> None:
    """Persist a find_issues result bundle to ``path/`` — the Spark
    analog of ``Datalab.save`` (reference datalab.py:581-599 +
    internal/serialize.py:28-85): the per-row issues table, the issue
    summary, and a JSON info/statistics sidecar.

    Deliberate divergences from the reference, both documented here:
    the issues table serializes as PARQUET, not issues.csv (the per-row
    table is data-sized — CSV would be the one non-columnar, schema-less
    artifact in the pipeline); and instead of pickling the lab object,
    everything ``load_datalab`` needs is explicit JSON (pickles are not
    portable across versions — the reference itself warns about this).
    Like the reference, the DATASET is not saved — only its fingerprint,
    so ``load_datalab(data=...)`` can refuse modified data.
    """
    import json
    import os

    if os.path.exists(path):
        if not force:
            raise FileExistsError("Please specify a new path or set force=True")
    else:
        os.makedirs(path, exist_ok=True)
    issues_df.write.mode("overwrite").parquet(os.path.join(path, "issues.parquet"))
    summary_df.write.mode("overwrite").parquet(os.path.join(path, "summary.parquet"))
    from .. import constants

    meta = {
        "format": 1,
        "sparkclean_reference_version": constants.REFERENCE_VERSION,
        "id_col": id_col,
        "num_classes": num_classes,
        "issue_columns": issues_df.columns,
        "data_fingerprint": frame_fingerprint(data) if data is not None else None,
        "info": info or {},
    }
    tmp = os.path.join(path, "datalab.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, "datalab.json"))


def load_datalab(
    spark, path: str, data: DataFrame | None = None
) -> tuple[DataFrame, DataFrame, dict]:
    """Reload a saved bundle: (issues_df, summary_df, meta) — the Spark
    analog of ``Datalab.load`` (reference datalab.py:602-640).  When
    ``data`` is passed, its fingerprint must match the one recorded at
    save time (the reference raises on modified data; so do we)."""
    import json
    import os

    with open(os.path.join(path, "datalab.json")) as f:
        meta = json.load(f)
    if data is not None and meta.get("data_fingerprint") is not None:
        fp = frame_fingerprint(data)
        if fp != meta["data_fingerprint"]:
            raise ValueError(
                "Data has been modified since Lab was saved. "
                "Cannot load Lab with modified data."
            )
    issues = spark.read.parquet(os.path.join(path, "issues.parquet"))
    summary = spark.read.parquet(os.path.join(path, "summary.parquet"))
    return issues, summary, meta


def get_report(
    issues_df: DataFrame,
    summary_df: DataFrame,
    id_col: str = "id",
    num_examples: int = 5,
    num_classes: int | None = None,
    include_description: bool = True,
    show_all_issues: bool = False,
) -> str:
    """Formatted text report over find_issues output — the Spark analog
    of Datalab's Reporter (datalab/internal/report.py:86-185): dataset
    header, issue summary sorted worst-first (only types with issues
    unless ``show_all_issues``), then one section per issue type with the
    ``num_examples`` lowest-scoring example ids.

    Driver-side work is bounded: one count, the (tiny, K-issue-types)
    summary collect, and a LIMIT-``num_examples`` sorted collect per
    issue type.
    """
    descriptions = {
        "label": "Examples whose given label is likely wrong (confident learning).",
        "outlier": "Examples that look atypical relative to the score distribution.",
        "class_imbalance": "Examples from rare classes (prior below threshold).",
        "null": "Examples with null/missing feature values.",
        "underperforming_group": "Examples in a cluster with poor model accuracy.",
        "near_duplicate": "Examples nearly identical to another example.",
        "non_iid": "Dataset ordering looks statistically non-IID.",
    }
    n_rows = issues_df.count()
    summary = sorted(
        summary_df.collect(), key=lambda r: -(r["num_issues"] or 0)
    )
    total_issues = sum(int(r["num_issues"] or 0) for r in summary)
    header = f"Dataset Information: num_examples: {n_rows}"
    if num_classes is not None:
        header += f", num_classes: {num_classes}"
    if total_issues == 0 and not show_all_issues:
        return (
            header
            + "\n\nNo issues found in the data. "
            + "(Set show_all_issues=True to see all checks that ran.)"
        )
    lines = [header, "", "Here is a summary of various issues found in your data:", ""]
    lines.append(f"{'issue_type':>24} {'num_issues':>12}")
    shown = [r for r in summary if show_all_issues or int(r["num_issues"] or 0) > 0]
    for r in shown:
        lines.append(f"{r['issue_type']:>24} {int(r['num_issues'] or 0):>12}")
    lines.append("")
    lines.append(
        "Data indices corresponding to top examples of each issue are shown below."
    )
    for r in shown:
        t = r["issue_type"]
        lines += ["", "", f"{'-' * 10} {t} issues {'-' * 10}", ""]
        lines.append(f"Number of examples with this issue: {int(r['num_issues'] or 0)}")
        if r["overall_score"] is not None:
            lines.append(f"Overall dataset quality in terms of this issue: {r['overall_score']:.4f}")
        if include_description and t in descriptions:
            lines.append(f"About this issue:\n\t{descriptions[t]}")
        score_col = f"{t}_score"
        if score_col in issues_df.columns:
            top = (
                issues_df.where(F.col(f"is_{t}_issue"))
                .orderBy(F.col(score_col).asc(), F.col(id_col).asc())
                .select(id_col, score_col)
                .limit(num_examples)
                .collect()
            )
            if top:
                lines.append("Top examples (id, score):")
                for row in top:
                    lines.append(f"\t{row[id_col]}\t{row[score_col]:.6f}")
    return "\n".join(lines)


def identifier_column_issues(df: DataFrame, cols: list[str]) -> DataFrame:
    """Datalab identifier-column manager
    (datalab/internal/issue_manager/identifier_column.py:28-133): an
    integer column is an identifier when its distinct values form a
    contiguous range {c, ..., c+n} with more than one value.

    One full-scan aggregation computes (distinct, min, max) for every
    candidate column in a single pass — the K-column result is driver-side
    tiny; summary score = 1.0 if no column is an identifier else 0.0.
    """
    int_cols = [
        c for c in cols
        if dict(df.dtypes).get(c) in ("tinyint", "smallint", "int", "bigint")
    ]
    aggs = []
    for c in int_cols:
        aggs += [
            F.countDistinct(F.col(c)).alias(f"_d_{c}"),
            F.min(F.col(c)).cast("long").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("long").alias(f"_mx_{c}"),
        ]
    rows = []
    if aggs:
        r = df.agg(*aggs).collect()[0]
        for c in int_cols:
            d, mn, mx = r[f"_d_{c}"], r[f"_mn_{c}"], r[f"_mx_{c}"]
            seq = (
                d is not None
                and mn is not None
                and mx > mn  # a single repeated value is not an identifier
                and int(d) == int(mx) - int(mn) + 1
            )
            rows.append((c, bool(seq)))
    any_id = any(flag for _, flag in rows)
    out = [(c, flag, 0.0 if any_id else 1.0) for c, flag in rows]
    return df.sparkSession.createDataFrame(
        out, "column: string, is_identifier_column: boolean, summary_score: double"
    )


def identifier_column_issues_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`identifier_column_issues`.

    Pass INTEGER columns only — the Spark side filters by dtype itself,
    SQL cannot; callers must apply the same filter to both (the entry
    does).  ``coalesce(..., false)`` mirrors the Spark side's False for
    all-null columns."""
    branches = []
    for c in cols:
        branches.append(
            f"SELECT '{c}' AS column, "
            f"coalesce(max({c}) > min({c}) AND count(DISTINCT {c}) = max({c}) - min({c}) + 1, false) "
            f"AS is_identifier_column FROM {table}"
        )
    union = "\n  UNION ALL ".join(branches)
    return f"""
WITH flags AS (
  {union}
), anyid AS (SELECT max(CASE WHEN is_identifier_column THEN 1 ELSE 0 END) AS a FROM flags)
SELECT f.column, f.is_identifier_column,
       (CASE WHEN anyid.a = 1 THEN 0.0 ELSE 1.0 END) AS summary_score
FROM flags f CROSS JOIN anyid"""


def near_duplicate_issues(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    threshold: float = 0.13,
) -> DataFrame:
    """Datalab near-duplicate manager (issue_manager/duplicate.py:20-228):

    * kNN over euclidean distance; nn_dist = distance to the 1st NN
    * median = max(median(nn_dist), eps)
    * near-duplicate sets = neighbors (among the k) with
      ``d < threshold * median``, symmetrised (reciprocal closure pass)
    * is_near_duplicate_issue = example appears in any set
    * near_duplicate_score = ``1 - exp(-nn_dist / median)``, exactly 0
      where nn_dist ~ 0 (exact duplicates)

    The edge list comes from the shared bucketed builder
    :func:`sparkclean.sim.knn.knn_edges` (banded LSH equi-join, no
    cartesian self-join) — the same graph the other feature-space
    managers consume, mirroring the reference's cached knn_graph
    (duplicate.py:154-171).
    """
    from ..sim.knn import knn_edges

    knn = (
        knn_edges(df, k=k, id_col=id_col, vec_col=vec_col, metric="euclidean")
        .select(
            F.col("qid").alias("_qid"),
            F.col("nid").alias("_nid"),
            F.col("d").alias("_d"),
            F.col("rk").alias("_rk"),
        )
        .persist()
    )
    nn = knn.where(F.col("_rk") == 1).select(
        F.col("_qid").alias(id_col), F.col("_d").alias("nn_dist")
    )
    from ..stats import exact_median

    # exact interpolated median via the approxQuantile band trick — no
    # exact Percentile aggregate (O(distinct) memory in ONE reducer at
    # 10^12 rows) anywhere in the plan; bit-identical to percentile(0.5)
    med = max(float(exact_median(nn, "nn_dist")), 1e-6)
    radius = threshold * med
    edges = knn.where(F.col("_d") < radius).select("_qid", "_nid")
    members = (
        edges.select(F.col("_qid").alias(id_col))
        .unionByName(edges.select(F.col("_nid").alias(id_col)))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    score = F.when(F.abs(F.col("nn_dist")) <= 1e-8, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.exp(-F.col("nn_dist") / F.lit(med))
    )
    return (
        nn.join(members, id_col, "left")
        .select(
            id_col,
            "nn_dist",
            score.alias("near_duplicate_score"),
            F.coalesce(F.col("_dup"), F.lit(False)).alias("is_near_duplicate_issue"),
        )
    )


def near_duplicate_issues_sql(
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    threshold: float = 0.13,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`near_duplicate_issues` (keep in sync).
    ``dim`` must match the table's embedding width (the Spark side
    infers it from the data)."""
    from ..sim.knn import knn_edges_cte_sql

    edges_cte = knn_edges_cte_sql(table, k=k, id_col=id_col, vec_col=vec_col, metric="euclidean", dim=dim)
    return f"""
WITH {edges_cte.lstrip()},
nn AS (SELECT qid, d AS nn_dist FROM knn WHERE rk = 1),
med AS (SELECT greatest(quantile_cont(nn_dist, 0.5), 1e-6) AS m FROM nn),
edges AS (SELECT qid, nid FROM knn CROSS JOIN med WHERE d < {threshold} * med.m),
members AS (
  SELECT DISTINCT qid AS id FROM edges
  UNION SELECT DISTINCT nid FROM edges
)
SELECT nn.qid AS {id_col}, round(nn.nn_dist, 6) AS nn_dist,
       round(CASE WHEN abs(nn.nn_dist) <= 1e-8 THEN 0.0
             ELSE 1.0 - exp(-nn.nn_dist / med.m) END, 6) AS near_duplicate_score,
       (m.id IS NOT NULL) AS is_near_duplicate_issue
FROM nn CROSS JOIN med LEFT JOIN members m ON m.id = nn.qid"""
