"""Distributed find_label_issues — every filter_by branch of the reference
(filter.py:57-450) re-expressed as DataFrame dataflow.

Branch → Spark plan:

* confident_learning   — reuse the confident-bin projection; flag rows with
                         ``is_confident AND guess != label``; then the
                         reduce-issues unflag (boosted argmax == label).
* predicted_neq_given  — pure projection ``argmax(p) != label`` + reduce.
* low_self_confidence /
  low_normalized_margin — n = num_label_issues(off_diagonal) (distributed
                         count), then exact bottom-n by (score, id) via a
                         quantile-banded selection (no global single-
                         partition sort; see :func:`bottom_n_flags`).
* prune_by_class       — per-class bottom-m via Window.partitionBy(label).
* prune_by_noise_rate  — per (given k, candidate j) top-c margins via a
                         broadcast join against the K×K prune-count matrix
                         and Window.partitionBy(label, j).  The reference
                         parallelises this with a multiprocessing pool
                         (filter.py:358-420); shuffle parallelism does it
                         for free here.
* both                 — AND of the two prune masks.

All masks except low_* then pass the reduce-issues filter
(filter.py:432-435).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import matrix_ops
from .joint import (
    compute_confident_joint,
    confident_joint_counts,
    label_counts,
    with_confident_bins,
)
from .scores import boosted_predicted_label, predicted_label, with_label_quality_scores
from .thresholds import get_confident_thresholds

FILTER_BY_METHODS = (
    "prune_by_noise_rate",
    "prune_by_class",
    "both",
    "confident_learning",
    "predicted_neq_given",
    "low_normalized_margin",
    "low_self_confidence",
)


def _with_reduce_mask(df: DataFrame, label_col: str, probs_col: str) -> DataFrame:
    """`_reduce_issues` (count.py:211-218): True where the 1e-6-boosted
    argmax equals the given label → never a label issue."""
    return df.withColumn(
        "_reduce_ok",
        boosted_predicted_label(F.col(label_col), F.col(probs_col)) == F.col(label_col).cast("int"),
    )


def num_label_issues(
    df: DataFrame,
    num_classes: int,
    label_col: str = "label",
    probs_col: str = "pred_probs",
    estimation_method: str = "off_diagonal",
    thresholds: list[float] | None = None,
    confident_joint: np.ndarray | None = None,
) -> int:
    """count.num_label_issues (count.py:50-173).

    off_diagonal: distributed count of confidently-off-diagonal rows minus
    reduce-issues rows.  off_diagonal_calibrated: driver arithmetic on the
    collected calibrated joint.
    """
    if estimation_method == "off_diagonal":
        if thresholds is None:
            thresholds = get_confident_thresholds(df, num_classes, label_col, probs_col)
        binned = _with_reduce_mask(
            with_confident_bins(df, thresholds, label_col, probs_col), label_col, probs_col
        )
        n = binned.where(
            F.col("is_confident")
            & (F.col("true_label_guess") != F.col(label_col).cast("int"))
            & ~F.col("_reduce_ok")
        ).count()
        return int(n)
    if estimation_method == "off_diagonal_calibrated":
        cj = compute_confident_joint(df, num_classes, label_col, probs_col, thresholds=thresholds)
        joint = matrix_ops.estimate_joint_from_cj(cj)
        n_total = int(np.asarray(cj).sum())
        return int(np.rint((1.0 - np.trace(joint)) * n_total))
    if estimation_method == "off_diagonal_custom":
        if confident_joint is None:
            raise ValueError("off_diagonal_custom requires confident_joint")
        counts = label_counts(df, num_classes, label_col)
        cal = matrix_ops.calibrate_confident_joint(confident_joint, counts)
        joint = matrix_ops.estimate_joint_from_cj(cal)
        return int(np.rint((1.0 - np.trace(joint)) * int(counts.sum())))
    raise ValueError(f"unknown estimation_method {estimation_method!r}")


def bottom_n_flags(
    df: DataFrame,
    n: int,
    score_col: str,
    id_col: str,
    flag_col: str = "is_label_issue",
    total: int | None = None,
    task_cap: int | None = None,
) -> DataFrame:
    """Flag exactly the n smallest rows by (score, id) total order.

    Scale strategy: a global single-partition window would serialise the
    whole table through one task.  Instead: (1) bound a quantile band
    around the cutoff with ``approxQuantile``; (2) rows strictly below
    the band are flagged by predicate alone; (3) only the (small) band
    is ranked — if ties at the cutoff inflate the measured band past
    ``task_cap``, the cutoff comes from the range-partitioned exact
    selection (stats._rows_at_ranks_selection) instead of a single-task
    window; (4) the result is a pure predicate — no join, no broadcast.
    At 100 TB no task ever sorts more than ~max(band/P, task_cap) rows,
    regardless of the score distribution.
    """
    if total is None:
        total = df.count()
    if n <= 0:
        return df.withColumn(flag_col, F.lit(False))
    if n >= total:
        return df.withColumn(flag_col, F.lit(True))

    frac = n / total
    # band half-width shrinks with the data so the single-task band rank
    # stays ≤ ~2e6 rows at ANY corpus size (see stats._adaptive_err)
    from ..stats import (
        _BAND_TARGET_ROWS,
        _adaptive_err,
        _rows_at_ranks_selection,
    )

    # Small-input fast path: the band machinery exists so no task ever
    # sorts a data-sized frame, but at total <= the task budget the band
    # path would rank up to the same row count in one task anyway — rank
    # the non-null scores directly and skip the approxQuantile + band-
    # measure jobs (3 Spark jobs -> 1; identical (score, id) cutoff).
    _fast_cap = task_cap if task_cap is not None else _BAND_TARGET_ROWS
    if total <= _fast_cap:
        w = Window.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
        cut = (
            df.where(F.col(score_col).isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == F.lit(n))
            .select(score_col, id_col)
            .collect()
        )
        if cut:
            s_star, id_star = cut[0][0], cut[0][1]
            return df.withColumn(
                flag_col,
                F.coalesce(
                    (F.col(score_col) < F.lit(s_star))
                    | (
                        (F.col(score_col) == F.lit(s_star))
                        & (F.col(id_col) <= F.lit(id_star))
                    ),
                    F.lit(False),
                ),
            )
        # n exceeded the non-null count — fall through to the band path
        # (which preserves the historical behaviour for that edge)

    err = min(0.005, _adaptive_err(total, None) * 2.5)
    lo_q, hi_q = max(0.0, frac - 2 * err), min(1.0, frac + 2 * err)
    lo, hi = df.approxQuantile(score_col, [lo_q, hi_q], err / 2)

    # ONE agg measures the band's ACTUAL size along with the below-count:
    # heavy ties at the cutoff can inflate the true band far past the
    # 2·err·N estimate without tripping the overshoot branch at all
    cnt = df.agg(
        F.count(F.when(F.col(score_col) < lo, 1)).alias("_below"),
        F.count(
            F.when((F.col(score_col) >= lo) & (F.col(score_col) <= hi), 1)
        ).alias("_band"),
        F.count(F.col(score_col)).alias("_nn"),
    ).first()
    c_below, c_band, c_nonnull = int(cnt["_below"]), int(cnt["_band"]), int(cnt["_nn"])
    band_cond = (F.col(score_col) >= F.lit(lo)) & (F.col(score_col) <= F.lit(hi))
    if c_below > n:
        # quantile estimate overshot (heavy ties) — extend band downward
        band_cond = F.col(score_col) <= F.lit(hi)
        c_band += c_below
        c_below = 0
    r = n - c_below
    if r <= 0:
        return df.withColumn(
            flag_col, F.coalesce(F.col(score_col) < F.lit(lo), F.lit(False))
        )
    if r > c_band:
        # upper estimate undershot — extend band upward (nulls excluded,
        # matching the SQL twins' NULLS-LAST ranking)
        band_cond = (
            (F.col(score_col) >= F.lit(lo))
            if c_below
            else F.col(score_col).isNotNull()
        )
        c_band = c_nonnull - c_below

    # rank only the band to find the exact n-th (score, id) cutoff, then
    # flag with a pure predicate — zero joins, one final pass.  A band
    # within the task budget ranks through one (tiny) task; a bigger one
    # (tie blocks, error floor) routes to the range-partitioned exact
    # selection, which never sorts a data-sized band in one task.
    cap = task_cap if task_cap is not None else _BAND_TARGET_ROWS
    band = df.where(band_cond)
    if c_band <= cap:
        w = Window.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
        cut = (
            band.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == F.lit(r))
            .select(score_col, id_col)
            .collect()
        )
        s_star, id_star = cut[0][0], cut[0][1]
    else:
        row = _rows_at_ranks_selection(
            band.select(score_col, id_col), [score_col, id_col], {r}, cap
        )[r]
        s_star, id_star = row[score_col], row[id_col]
    # coalesce: a NULL score (e.g. null caption → null features) must
    # flag a definite False, matching the SQL twins' NULLS-LAST ranking,
    # not propagate NULL into a boolean output column
    return df.withColumn(
        flag_col,
        F.coalesce(
            (F.col(score_col) < F.lit(s_star))
            | (
                (F.col(score_col) == F.lit(s_star))
                & (F.col(id_col) <= F.lit(id_star))
            ),
            F.lit(False),
        ),
    )


def find_label_issues(
    df: DataFrame,
    num_classes: int,
    id_col: str = "id",
    label_col: str = "label",
    probs_col: str = "pred_probs",
    filter_by: str = "prune_by_noise_rate",
    frac_noise: float = 1.0,
    min_examples_per_class: int = 1,
    thresholds: list[float] | None = None,
) -> DataFrame:
    """Returns the input plus ``is_label_issue BOOL``.

    Mirrors filter.find_label_issues (filter.py:57-450) for single-label
    classification.
    """
    if filter_by not in FILTER_BY_METHODS:
        raise ValueError(f"unknown filter_by {filter_by!r}")

    label = F.col(label_col).cast("int")
    if thresholds is None:
        thresholds = get_confident_thresholds(df, num_classes, label_col, probs_col)

    if filter_by == "predicted_neq_given":
        out = df.withColumn(
            "is_label_issue", predicted_label(F.col(probs_col)) != label
        )
        return _apply_reduce(out, label_col, probs_col)

    if filter_by == "confident_learning":
        binned = with_confident_bins(df, thresholds, label_col, probs_col)
        out = binned.withColumn(
            "is_label_issue",
            F.col("is_confident") & (F.col("true_label_guess") != label),
        ).drop("true_label_guess", "is_confident")
        return _apply_reduce(out, label_col, probs_col)

    if filter_by in ("low_self_confidence", "low_normalized_margin"):
        method = filter_by[4:]
        # fused issue-count + row-count: one aggregation job instead of
        # num_label_issues' count followed by bottom_n_flags' total
        # count (identical values: same binned condition, same total)
        binned = _with_reduce_mask(
            with_confident_bins(df, thresholds, label_col, probs_col),
            label_col,
            probs_col,
        )
        agg_row = binned.agg(
            F.sum(
                F.when(
                    F.col("is_confident")
                    & (F.col("true_label_guess") != label)
                    & ~F.col("_reduce_ok"),
                    1,
                ).otherwise(0)
            ).alias("_n"),
            F.count(F.lit(1)).alias("_total"),
        ).first()
        n_issues = int(agg_row["_n"] or 0)
        total = int(agg_row["_total"])
        scored = with_label_quality_scores(
            df, num_classes, label_col, probs_col, method=method, out_col="_lq"
        )
        out = bottom_n_flags(scored, n_issues, "_lq", id_col, total=total)
        return out.drop("_lq")

    # prune_by_class / prune_by_noise_rate / both need the calibrated joint
    binned = with_confident_bins(df, thresholds, label_col, probs_col)
    cj_raw = confident_joint_counts(binned, num_classes, label_col)
    counts = label_counts(df, num_classes, label_col)
    cj = matrix_ops.calibrate_confident_joint(cj_raw, counts)
    pcm = matrix_ops.keep_at_least_n_per_class(
        cj.T, n=min_examples_per_class, frac_noise=frac_noise
    )

    masks = []
    if filter_by in ("prune_by_class", "both"):
        masks.append(_prune_by_class_mask(df, pcm, counts, min_examples_per_class, id_col, label_col, probs_col))
    if filter_by in ("prune_by_noise_rate", "both"):
        masks.append(_prune_by_count_mask(df, pcm, counts, min_examples_per_class, id_col, label_col, probs_col))

    flagged = masks[0]
    for m in masks[1:]:
        flagged = flagged.join(m.withColumnRenamed("is_label_issue", "_m2"), id_col, "inner")
        flagged = flagged.withColumn("is_label_issue", F.col("is_label_issue") & F.col("_m2")).drop("_m2")

    out = df.join(flagged.select(id_col, "is_label_issue"), id_col, "left").fillna(
        {"is_label_issue": False}
    )
    return _apply_reduce(out, label_col, probs_col)


def _apply_reduce(df: DataFrame, label_col: str, probs_col: str) -> DataFrame:
    out = _with_reduce_mask(df, label_col, probs_col)
    return out.withColumn(
        "is_label_issue", F.col("is_label_issue") & ~F.col("_reduce_ok")
    ).drop("_reduce_ok")


def _prune_by_class_mask(
    df: DataFrame,
    pcm: np.ndarray,
    counts: np.ndarray,
    min_examples_per_class: int,
    id_col: str,
    label_col: str,
    probs_col: str,
) -> DataFrame:
    """Per class k: flag the (count_k - pcm[k,k]) rows with smallest
    p(:,k) (filter.py:829-863). One shuffle keyed by label; skew across
    classes is split by AQE."""
    k_range = range(len(counts))
    num_issues = {
        k: int(counts[k] - pcm[k, k]) if counts[k] > min_examples_per_class else 0
        for k in k_range
    }
    issues_arr = F.array(*[F.lit(num_issues[k]) for k in k_range])
    label = F.col(label_col).cast("int")
    scored = df.select(
        id_col,
        label.alias("_lbl"),
        F.element_at(F.col(probs_col), label + 1).cast("double").alias("_pk"),
    )
    w = Window.partitionBy("_lbl").orderBy(F.col("_pk").asc(), F.col(id_col).asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.element_at(issues_arr, F.col("_lbl") + 1))
        .select(id_col, (F.col("_rn") <= F.col("_n")).alias("is_label_issue"))
    )


def _prune_by_count_mask(
    df: DataFrame,
    pcm: np.ndarray,
    counts: np.ndarray,
    min_examples_per_class: int,
    id_col: str,
    label_col: str,
    probs_col: str,
) -> DataFrame:
    """For each off-diagonal (true j, given k): flag the pcm[j,k] rows
    labeled k with largest margin p_j - p_k (filter.py:867-907).

    Plan: explode each row into its (K-1) candidate classes j with a
    positive prune count, then one Window.partitionBy(label, j) rank.  The
    prune-count matrix rides along as a literal array — no join, no extra
    shuffle beyond the single (label, j) window."""
    num_classes = len(counts)
    label = F.col(label_col).cast("int")

    # literal K×K matrix, indexed [j+1][k+1]
    pcm_lit = F.array(
        *[F.array(*[F.lit(int(pcm[j, k])) for k in range(num_classes)]) for j in range(num_classes)]
    )
    candidates = F.filter(
        F.transform(F.sequence(F.lit(0), F.lit(num_classes - 1)), lambda j: j),
        lambda j: (j != label)
        & (F.element_at(F.element_at(pcm_lit, j + 1), label + 1) > 0),
    )
    exploded = (
        df.select(
            id_col,
            label.alias("_lbl"),
            F.col(probs_col).alias("_p"),
            F.explode(candidates).alias("_j"),
        )
        .withColumn(
            "_margin",
            F.element_at("_p", F.col("_j") + 1).cast("double")
            - F.element_at("_p", F.col("_lbl") + 1).cast("double"),
        )
        .withColumn("_cnt", F.element_at(F.element_at(pcm_lit, F.col("_j") + 1), F.col("_lbl") + 1))
    )
    w = Window.partitionBy("_lbl", "_j").orderBy(F.col("_margin").desc(), F.col(id_col).asc())
    counts_lit = F.array(*[F.lit(int(c)) for c in counts])
    flagged = (
        exploded.withColumn("_rn", F.row_number().over(w))
        .where(
            (F.col("_rn") <= F.col("_cnt"))
            & (F.element_at(counts_lit, F.col("_lbl") + 1) > min_examples_per_class)
        )
        .select(id_col)
        .distinct()
    )
    return (
        df.select(id_col)
        .join(flagged.withColumn("is_label_issue", F.lit(True)), id_col, "left")
        .fillna({"is_label_issue": False})
    )


def find_label_issues_batched(
    df: DataFrame,
    num_classes: int,
    id_col: str = "id",
    label_col: str = "label",
    probs_col: str = "pred_probs",
    thorough: bool = True,
) -> DataFrame:
    """The 2-pass streaming dataflow of
    experimental/label_issues_batched.py:43-227, natively distributed:

    pass 1  groupBy(label) mean → thresholds (order-invariant)
    pass 2  score projection + issue-count aggregation
    final   exact bottom-n by (score, id) + reduce-issues unflag

    ``thorough=False`` uses the fast count
    ``sum(p[argmax] >= t[argmax]-1e-6 AND argmax != label)``
    (label_issues_batched.py:564-673); ``thorough=True`` matches
    num_label_issues(off_diagonal).
    """
    thresholds = get_confident_thresholds(df, num_classes, label_col, probs_col)
    label = F.col(label_col).cast("int")

    if thorough:
        n_issues = num_label_issues(
            df, num_classes, label_col, probs_col, "off_diagonal", thresholds
        )
    else:
        t_arr = F.array(*[F.lit(float(t)) for t in thresholds])
        am = predicted_label(F.col(probs_col))
        confident_neq = (
            (F.array_max(F.col(probs_col)).cast("double")
             >= F.element_at(t_arr, am + 1) - F.lit(1e-6))
            & (am != label)
        )
        n_issues = int(
            df.agg(F.sum(F.when(confident_neq, 1).otherwise(0))).collect()[0][0] or 0
        )

    scored = with_label_quality_scores(
        df, num_classes, label_col, probs_col, method="self_confidence", out_col="_lq"
    )
    flagged = bottom_n_flags(scored, n_issues, "_lq", id_col)
    out = _apply_reduce(flagged, label_col, probs_col)
    return out.withColumnRenamed("_lq", "label_quality")
