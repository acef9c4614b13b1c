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
SELECT round((tp / ap) * (tp / ap) / (2.0 * fp), 6) AS pu_f1 FROM agg WHERE fp <> 0"""


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
