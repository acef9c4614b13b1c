"""Task-specific quality scores: regression + multilabel.

* regression residual score  — ``exp(-|label - prediction|)``
  (regression/rank.py:117-119); the OUTRE variant standardises
  (label, residual) into 2-D features and reuses the KNN-distance OOD
  scorer of §2.5 (regression/rank.py:122-173) — exposed here as the
  feature-builder + sim.knn composition.
* multilabel scores — one-vs-rest self-confidence per class
  (``p_k`` if k ∈ given set else ``1-p_k``, internal/multilabel_scorer.py
  ClassLabelScorer.SELF_CONFIDENCE) pooled with EMA
  (multilabel_scorer.py:134-205) — both Catalyst-native.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .pooling import ema_col, ema_sql


def regression_residual_score(label: Column, prediction: Column) -> Column:
    return F.exp(-F.abs(label.cast("double") - prediction.cast("double")))


def regression_residual_score_sql(label: str, prediction: str) -> str:
    return f"exp(-abs(({label})::DOUBLE - ({prediction})::DOUBLE))"


def multilabel_class_scores(probs: Column, given: Column) -> Column:
    """array<double>: per-class one-vs-rest self-confidence."""
    return F.transform(
        probs,
        lambda p, i: F.when(F.array_contains(given, i), p.cast("double")).otherwise(
            F.lit(1.0) - p.cast("double")
        ),
    )


def multilabel_class_scores_sql(probs: str, given: str) -> str:
    # DuckDB lambda index is 1-based; class ids are 0-based
    return (
        f"list_transform({probs}, (p, i) -> CASE WHEN list_contains({given}, i - 1) "
        f"THEN p::DOUBLE ELSE 1.0 - p::DOUBLE END)"
    )


def multilabel_quality_score(probs: Column, given: Column, alpha: float | None = None) -> Column:
    return ema_col(multilabel_class_scores(probs, given), alpha)


def multilabel_quality_score_sql(probs: str, given: str, alpha: float | None = None) -> str:
    return ema_sql(multilabel_class_scores_sql(probs, given), alpha)


# ------------------------------------------------------------ PU learning


def pu_f1_agg(s: Column, prob_s_eq_1: Column) -> Column:
    """Claesen's PU-learning F1 estimate (internal/util.py:251-271):
    ``recall^2 / (2 * frac_predicted_positive)`` with prediction =
    ``P(s=1|x) >= 0.5``. A single distributed aggregation."""
    pred = prob_s_eq_1.cast("double") >= F.lit(0.5)
    tp = F.sum(((s.cast("int") == 1) & pred).cast("long"))
    all_pos = F.sum((s.cast("int") == 1).cast("long"))
    frac_pos = F.sum(pred.cast("long")) / F.count(F.lit(1))
    recall = tp.cast("double") / all_pos.cast("double")
    return F.when(frac_pos != 0, recall * recall / (F.lit(2.0) * frac_pos))


def pu_f1_sql(table: str, s: str, prob_s_eq_1: str, extra_cte: str = "") -> str:
    """DuckDB twin of :func:`pu_f1_agg` (keep in sync). ``extra_cte`` lets the
    caller prepend CTEs (must end with ", ")."""
    return f"""
WITH {extra_cte}puf AS (
  SELECT ({s})::INT AS s, (({prob_s_eq_1})::DOUBLE >= 0.5) AS pred FROM {table}
), agg AS (
  SELECT sum(CASE WHEN s = 1 AND pred THEN 1 ELSE 0 END)::DOUBLE AS tp,
         sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::DOUBLE AS ap,
         sum(CASE WHEN pred THEN 1 ELSE 0 END)::DOUBLE / count(*) AS fp
  FROM puf
)
SELECT CASE WHEN fp <> 0
            THEN round((tp / ap) * (tp / ap) / (2.0 * fp), 6) END AS pu_f1
FROM agg"""


# ------------------------------------------------------------ regression OUTRE


def outre_features(label: Column, prediction: Column, stats: dict, scale: float = 5.0):
    """Standardised 2-D OUTRE features (regression/rank.py:158-168):
    ``z(label)`` and ``scale * z(prediction - label)``, with the means/stds
    precomputed by one distributed aggregation (``outre_stats_agg``)."""
    lz = (label.cast("double") - F.lit(stats["label_mean"])) / F.lit(stats["label_std"] + 1e-100)
    r = prediction.cast("double") - label.cast("double")
    rz = (r - F.lit(stats["resid_mean"])) / F.lit(stats["resid_std"] + 1e-100)
    return lz, F.lit(scale) * rz


def outre_stats(df, label_col: str, pred_col: str) -> dict:
    """Population mean/std of label and residual (np.std semantics: ddof=0)."""
    label = F.col(label_col).cast("double")
    r = F.col(pred_col).cast("double") - label
    row = df.agg(
        F.avg(label).alias("lm"),
        (F.stddev_pop(label)).alias("ls"),
        F.avg(r).alias("rm"),
        (F.stddev_pop(r)).alias("rs"),
    ).first()
    return {
        "label_mean": float(row["lm"]),
        "label_std": float(row["ls"]),
        "resid_mean": float(row["rm"]),
        "resid_std": float(row["rs"]),
    }


# ------------------------------------------------------- segmentation


def segmentation_image_score(pixel_scores: Column, temperature: float = 0.1) -> Column:
    """Per-image label-quality score: softmin over per-pixel self-confidence
    (segmentation/rank.py:14-130; default temperature 0.1)."""
    from .pooling import softmin_col

    return softmin_col(pixel_scores, temperature)


def segmentation_image_score_sql(pixel_scores: str, temperature: float = 0.1) -> str:
    from .pooling import softmin_sql

    return softmin_sql(pixel_scores, temperature)


def segmentation_pixel_issue_count(pixel_scores: Column, threshold: float = 0.1) -> Column:
    """#pixels flagged by issues_from_scores (segmentation/rank.py:133-187):
    the issue mask is ``pixel_scores < threshold``."""
    return F.size(F.filter(pixel_scores, lambda s: s < F.lit(float(threshold))))


def segmentation_pixel_issue_count_sql(pixel_scores: str, threshold: float = 0.1) -> str:
    return f"len(list_filter({pixel_scores}, s -> s < {float(threshold)}))"


# ------------------------------------------------------ object detection

OBJECTLAB_TEMPERATURE = 0.1  # internal/constants.py:24
_TINY = 1e-100


def objectlab_image_scores(
    df,
    image_col: str,
    subtype_cols: dict,
    temperature: float = OBJECTLAB_TEMPERATURE,
    weights: dict | None = None,
):
    """Pool per-box subtype scores into one image score
    (object_detection/rank.py:1017-1115): per subtype softmin over the
    image's non-null box scores (empty -> 1.0, rank.py:513-520), then the
    weighted geometric combine ``exp(sum_w w_s ln(tiny + pooled_s))`` with
    default weights 1/3 each (internal/constants.py:28-38)."""
    from .pooling import softmin_col

    names = list(subtype_cols)
    if weights is None:
        weights = {n: 1.0 / len(names) for n in names}
    aggs = [
        F.collect_list(subtype_cols[n]).alias(f"_sub_{n}") for n in names
    ]  # collect_list drops nulls = the reference's NaN filter
    g = df.groupBy(image_col).agg(*aggs)
    combined = None
    for n in names:
        pooled = F.when(
            F.size(F.col(f"_sub_{n}")) > 0, softmin_col(F.col(f"_sub_{n}"), temperature)
        ).otherwise(F.lit(1.0))
        term = F.lit(float(weights[n])) * F.log(F.lit(_TINY) + pooled)
        combined = term if combined is None else combined + term
    return g.select(image_col, F.exp(combined).alias("label_quality_score"))


def objectlab_image_scores_sql(
    box_rel: str,
    image_col: str,
    subtype_exprs: dict,
    temperature: float = OBJECTLAB_TEMPERATURE,
    weights: dict | None = None,
) -> str:
    """DuckDB twin of :func:`objectlab_image_scores` (keep in sync).
    Returns a full SELECT over ``box_rel``."""
    from .pooling import softmin_sql

    names = list(subtype_exprs)
    if weights is None:
        weights = {n: 1.0 / len(names) for n in names}
    lists = ", ".join(
        f"list({subtype_exprs[n]}) FILTER (({subtype_exprs[n]}) IS NOT NULL) AS _sub_{n}"
        for n in names
    )
    terms = " + ".join(
        f"{float(weights[n])} * ln({_TINY} + CASE WHEN len(_sub_{n}) > 0 THEN "
        f"{softmin_sql(f'_sub_{n}', temperature)} ELSE 1.0 END)"
        for n in names
    )
    return (
        f"SELECT {image_col}, exp({terms}) AS label_quality_score "
        f"FROM (SELECT {image_col}, {lists} FROM {box_rel} GROUP BY 1)"
    )


def filter_pixel_issues_by_class(
    issue: Column, label: Column, probs: Column, class_index: int
) -> Column:
    """segmentation/summary.py:268-309: keep flagged pixels whose given
    label OR argmax-predicted label is the class of interest."""
    from .scores import predicted_label

    k = F.lit(int(class_index))
    return issue & ((label.cast("int") == k) | (predicted_label(probs) == k))


def filter_pixel_issues_by_class_sql(
    issue: str, label: str, probs: str, class_index: int
) -> str:
    """DuckDB twin of :func:`filter_pixel_issues_by_class`."""
    return (
        f"({issue} AND ({label} = {int(class_index)} "
        f"OR list_position({probs}, list_max({probs})) - 1 = {int(class_index)}))"
    )
