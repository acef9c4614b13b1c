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
