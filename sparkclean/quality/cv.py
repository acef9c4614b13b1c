"""Cross-validated out-of-sample pred_probs + confident joint.

Mirrors the FLOW of ``estimate_confident_joint_and_cv_pred_proba``
(/root/reference/cleanlab/count.py:888-1066): stratified K folds, fit a
classifier on the K-1 train folds, predict the held-out fold, assemble
one out-of-sample ``pred_probs`` matrix, then compute the confident
joint from it (strategy (2) in the reference's notes — combine probs
first, one confident joint over everything).

The reference plugs in any sklearn estimator; this engine has no sklearn,
so the pluggable scorer is a deterministic diagonal Gaussian naive Bayes
over the first ``n_dims`` feature dimensions — every stage (stratified
fold assignment, leave-fold-out sufficient statistics, per-row posterior)
is expressed as DataFrame dataflow with an exact DuckDB twin:

* fold       = row_number within label (ordered by id) mod n_folds —
               deterministic stratification (reference: StratifiedKFold).
* statistics = ONE groupBy(fold, label) pass collecting count / sum /
               sum-of-squares per dimension; leave-fold-out stats are
               totals minus the fold's own contribution (no per-fold
               re-scan — 1 shuffle regardless of n_folds).
* posterior  = pure projection: softmax over per-class joint
               log-likelihoods with the row's own fold's LOFO stats
               inlined as literals (K×n_folds×n_dims tiny).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VAR_FLOOR = 1e-9
LOG2PI = math.log(2.0 * math.pi)


def with_cv_fold(
    df: DataFrame, id_col: str, label_col: str, n_folds: int = 5
) -> DataFrame:
    """Deterministic stratified fold id in [0, n_folds): round-robin
    within each label in id order."""
    w = Window.partitionBy(F.col(label_col)).orderBy(F.col(id_col).asc())
    return df.withColumn("_fold", (F.row_number().over(w) - 1) % n_folds)


def _lofo_stats(
    df: DataFrame, label_col: str, n_folds: int, num_classes: int, n_dims: int
) -> dict:
    """{(fold, class): (prior, [mean_d], [var_d])} — leave-fold-out."""
    dims = [F.col("_x")[d].cast("double").alias(f"_v{d}") for d in range(n_dims)]
    base = df.select(
        "_fold", F.col(label_col).cast("int").alias("_k"), *dims
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for d in range(n_dims):
        aggs.append(F.sum(f"_v{d}").alias(f"_s{d}"))
        aggs.append(F.sum(F.col(f"_v{d}") * F.col(f"_v{d}")).alias(f"_q{d}"))
    per_cell = base.groupBy("_fold", "_k").agg(*aggs).collect()

    cells = {(r["_fold"], r["_k"]): r for r in per_cell}
    present = {k for (_, k) in cells}
    missing = [k for k in range(num_classes) if k not in present]
    if missing:
        # mirror cleanlearning.fit_predict: fail loudly and identically in
        # both engines instead of a bare KeyError here while the DuckDB
        # twin silently compacts the class list
        raise ValueError(
            f"classes {missing} have no examples — leave-fold-out GNB "
            "(like the reference's cross_val_predict) needs every class present"
        )
    tot = {}
    for (_, k), r in cells.items():
        t = tot.setdefault(k, [0.0] * (1 + 2 * n_dims))
        t[0] += r["_n"]
        for d in range(n_dims):
            t[1 + 2 * d] += r[f"_s{d}"]
            t[2 + 2 * d] += r[f"_q{d}"]

    out = {}
    for f in range(n_folds):
        # clamp BEFORE totalling so the prior matches the SQL twin even
        # when a (fold, class) cell is empty
        n_f = sum(
            max(tot[k][0] - (cells[(f, k)]["_n"] if (f, k) in cells else 0.0), 1.0)
            for k in range(num_classes)
        )
        for k in range(num_classes):
            r = cells.get((f, k))
            n = tot[k][0] - (r["_n"] if r else 0.0)
            n = max(n, 1.0)
            means, vars_ = [], []
            for d in range(n_dims):
                s = tot[k][1 + 2 * d] - (r[f"_s{d}"] if r else 0.0)
                q = tot[k][2 + 2 * d] - (r[f"_q{d}"] if r else 0.0)
                m = s / n
                means.append(m)
                vars_.append(max(q / n - m * m, VAR_FLOOR))
            out[(f, k)] = (n / max(n_f, 1.0), means, vars_)
    return out


def with_cv_pred_probs(
    df: DataFrame,
    num_classes: int,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    n_folds: int = 5,
    n_dims: int = 4,
    out_col: str = "pred_probs",
) -> DataFrame:
    """Adds out-of-sample ``pred_probs`` (array<double>, length K) from
    the leave-fold-out Gaussian NB posterior."""
    folded = with_cv_fold(df, id_col, label_col, n_folds).withColumn(
        "_x", F.slice(F.col(vec_col), 1, n_dims)
    )
    stats = _lofo_stats(folded, label_col, n_folds, num_classes, n_dims)
    probs_udf = _posterior_udf(stats, num_classes, n_folds, n_dims)
    return folded.withColumn(
        out_col, probs_udf(F.col("_fold"), F.col("_x"))
    ).drop("_x")


def _posterior_udf(stats: dict, num_classes: int, n_folds: int, n_dims: int):
    """Arrow-vectorized leave-fold-out GNB posterior.

    The earlier formulation inlined the (fold × class × dim) stats as a
    ~1200-node Catalyst CASE/literal tree — correct, but every job that
    referenced the probs column re-analyzed and re-codegen'd the tree
    (~2-3 s per stage, constant in data size).  This kernel is the
    round-2 playbook's shape instead: one Arrow batch transfer and a
    per-DIMENSION accumulation that is bit-identical to the old
    left-associated fold — ll starts at the log-prior literal and adds
    -((x-m)·(x-m))/(2v) - 0.5·(LOG2PI+ln v) for d = 0..n_dims-1 in
    order, then the same max-shifted softmax.  The DuckDB twin
    (cv_pred_probs_sql) is unchanged.
    """
    from pyspark.sql.functions import pandas_udf

    pri = np.array(
        [
            [math.log(max(stats[(f, k)][0], 1e-300)) for k in range(num_classes)]
            for f in range(n_folds)
        ]
    )
    m = np.array(
        [[stats[(f, k)][1] for k in range(num_classes)] for f in range(n_folds)]
    )  # (fold, class, dim)
    # precompute the two per-(f,k,d) literals exactly as the old column
    # built them: 2.0·v and 0.5·(LOG2PI + ln v).  math.log per element,
    # NOT np.log — numpy's SIMD float64 log is not guaranteed to match
    # libm (which the old F.lit literal and DuckDB's ln both use) to the
    # last ULP, and these values must replay literal-for-literal.
    v = [[stats[(f, k)][2] for k in range(num_classes)] for f in range(n_folds)]
    v2 = np.array([[[2.0 * vd for vd in ks] for ks in fs] for fs in v])
    cst = np.array(
        [[[0.5 * (LOG2PI + math.log(vd)) for vd in ks] for ks in fs] for fs in v]
    )

    def _compute(fo: np.ndarray, X: np.ndarray) -> np.ndarray:
        ll = pri[fo].copy()  # (n, K)
        for d in range(n_dims):
            xd = X[:, d][:, None]
            md = m[fo, :, d]
            ll = ll + (-((xd - md) * (xd - md)) / v2[fo, :, d] - cst[fo, :, d])
        mx = ll.max(axis=1, keepdims=True)
        e = np.exp(ll - mx)
        # left-associated k = 0..K-1 accumulation, matching the old
        # F.aggregate fold and the DuckDB list_aggregate 'sum' exactly
        # (np.sum's pairwise reduction could differ by an ULP)
        tot = e[:, 0].copy()
        for k in range(1, num_classes):
            tot = tot + e[:, k]
        return e / tot[:, None]

    @pandas_udf("array<double>")
    def post(fold: pd.Series, x: pd.Series) -> pd.Series:
        n = len(x)
        valid = np.array(
            [r is not None and len(r) == n_dims for r in x], dtype=bool
        )
        fo = fold.to_numpy(dtype=np.int64)
        if valid.all():
            X = np.asarray([np.asarray(r, dtype=np.float64) for r in x])
            return pd.Series(list(_compute(fo, X)))
        # null/short vectors → null posterior (the old Catalyst
        # expression yielded null cells; don't fail the whole batch)
        out = pd.Series([None] * n, dtype=object)
        if valid.any():
            X = np.asarray(
                [np.asarray(r, dtype=np.float64) for r, ok in zip(x, valid) if ok]
            )
            p = _compute(fo[valid], X)
            for i, arr in zip(np.flatnonzero(valid), p):
                out.iat[i] = arr
        return out

    return post


def cv_pred_probs_sql(
    table: str,
    num_classes: int,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    n_folds: int = 5,
    n_dims: int = 4,
) -> str:
    """DuckDB CTE chain ending in ``pp(vec_id, label, p)`` where ``p`` is
    the out-of-sample CV posterior — drop-in replacement for the softmax
    ``pp`` CTE so the downstream threshold/bin/joint CTEs compose
    unchanged.  Embed inside ``WITH {this}, ...``."""
    dim_rows = "\n    UNION ALL ".join(
        f"SELECT _id, _fold, _k, {d} AS _d, _x[{d + 1}]::DOUBLE AS x FROM folded"
        for d in range(n_dims)
    )
    return f"""
folded AS MATERIALIZED (
  SELECT {id_col} AS _id, {label_col}::INT AS _k,
         (row_number() OVER (PARTITION BY {label_col} ORDER BY {id_col} ASC) - 1) % {n_folds} AS _fold,
         {vec_col}[1:{n_dims}] AS _x
  FROM {table}
), dimrows AS MATERIALIZED (
    {dim_rows}
), cellstats AS (
  SELECT _fold, _k, _d, count(*)::DOUBLE AS n, sum(x) AS s, sum(x * x) AS q
  FROM dimrows GROUP BY 1, 2, 3
), totstats AS (
  SELECT _k, _d, sum(n) AS n, sum(s) AS s, sum(q) AS q FROM cellstats GROUP BY 1, 2
), lofo AS (
  SELECT f.f AS _fold, t._k, t._d,
         greatest(t.n - coalesce(c.n, 0), 1.0) AS n,
         (t.s - coalesce(c.s, 0)) / greatest(t.n - coalesce(c.n, 0), 1.0) AS m,
         greatest(
           (t.q - coalesce(c.q, 0)) / greatest(t.n - coalesce(c.n, 0), 1.0)
           - pow((t.s - coalesce(c.s, 0)) / greatest(t.n - coalesce(c.n, 0), 1.0), 2),
           {VAR_FLOOR!r}) AS v
  FROM totstats t CROSS JOIN range(0, {n_folds}) f(f)
  LEFT JOIN cellstats c ON c._fold = f.f AND c._k = t._k AND c._d = t._d
), foldn AS (
  SELECT _fold, sum(n) AS nf FROM (SELECT DISTINCT _fold, _k, n FROM lofo WHERE _d = 0) GROUP BY 1
), prior AS (
  SELECT l._fold, l._k, ln(greatest(l.n / greatest(fn.nf, 1.0), 1e-300)) AS lp
  FROM (SELECT DISTINCT _fold, _k, n FROM lofo WHERE _d = 0) l JOIN foldn fn USING (_fold)
), ll AS (
  SELECT r._id, r._fold, s._k AS k,
         p.lp + sum(-pow(r.x - s.m, 2) / (2.0 * s.v) - 0.5 * ({LOG2PI!r} + ln(s.v))) AS l
  FROM dimrows r
  JOIN lofo s ON s._fold = r._fold AND s._d = r._d
  JOIN prior p ON p._fold = r._fold AND p._k = s._k
  GROUP BY 1, 2, 3, p.lp
), lvec AS (
  SELECT _id, list(l ORDER BY k) AS ls FROM ll GROUP BY 1
), pp AS (
  SELECT f._id AS {id_col}, f._k AS {label_col},
         list_transform(e, x -> x / list_aggregate(e, 'sum')) AS p
  FROM (
    SELECT _id, list_transform(ls, x -> exp(x - list_max(ls))) AS e FROM lvec
  ) t JOIN folded f ON f._id = t._id
)"""
