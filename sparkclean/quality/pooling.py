"""Score-pooling aggregators over array<double> columns.

* softmin — token / segmentation / object-detection sentence-or-image
  pooling (token_classification/rank.py:231-274, shared by
  segmentation/rank.py and object_detection/rank.py):
      pooled = Σ s_i · w_i / Σ w_i,  w = exp(((1-s)/T) - max((1-s)/T))
* EMA — multilabel per-example aggregation
  (internal/multilabel_scorer.py:134-205): scores sorted descending,
  EMA_t = α·s_t + (1-α)·EMA_{t-1}, α = 2/(K+1) by default.  Closed form
  used here: on the descending-sorted vector, weight of s_1 is
  (1-α)^(K-1) and of s_t (t≥2) is α·(1-α)^(K-t).

Both are pure Catalyst expressions with DuckDB twins (DuckDB lambda
indexes are 1-based, Spark's 0-based — the twins account for it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..text.shared import ascii_lower_col as _ascii_lower_col
from ..text.shared import ascii_lower_py as _ascii_lower_py
from ..text.shared import ascii_lower_sql as _ascii_lower_sql


def softmin_col(scores: Column, temperature: float = 0.05) -> Column:
    """Two scalar folds: Σ s·e^{(1-s)/T} / Σ e^{(1-s)/T}.

    The reference's max-shift inside softmax cancels exactly in this
    ratio; dropping it keeps every lambda scalar, so Catalyst never
    re-evaluates an array subtree per element (the naive shifted form is
    O(n²) under interpreted higher-order functions).  s ∈ [0,1] and
    T ≥ 0.05 bound the exponent at 20 — no overflow.
    """
    t = float(temperature)
    num = F.aggregate(
        scores, F.lit(0.0), lambda a, s: a + s * F.exp((F.lit(1.0) - s) / F.lit(t))
    )
    den = F.aggregate(
        scores, F.lit(0.0), lambda a, s: a + F.exp((F.lit(1.0) - s) / F.lit(t))
    )
    return num / den


def softmin_sql(scores: str, temperature: float = 0.05) -> str:
    t = float(temperature)
    return f"""
(SELECT list_aggregate(list_transform(range(1, len(sc) + 1), i -> sc[i] * w[i]), 'sum')
        / list_aggregate(w, 'sum')
 FROM (
   SELECT sc, list_transform(z, v -> exp(v - list_max(z))) AS w
   FROM (SELECT {scores} AS sc,
                list_transform({scores}, s -> (1.0 - s) / {t}) AS z)
 ))"""


def ema_col(scores: Column, alpha: float | None = None) -> Column:
    desc = F.reverse(F.array_sort(scores))
    k = F.size(scores).cast("double")
    a = F.lit(float(alpha)) if alpha is not None else F.lit(2.0) / (k + F.lit(1.0))
    # weight(0-based idx i): i==0 → (1-a)^(K-1); else a·(1-a)^(K-1-i)
    weighted = F.transform(
        desc,
        lambda s, i: s
        * F.when(i == 0, F.pow(F.lit(1.0) - a, k - F.lit(1.0))).otherwise(
            a * F.pow(F.lit(1.0) - a, k - F.lit(1.0) - i.cast("double"))
        ),
    )
    return F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)


def ema_sql(scores: str, alpha: float | None = None) -> str:
    a = f"{float(alpha)}" if alpha is not None else "(2.0 / (len(sc) + 1))"
    return f"""
(SELECT list_aggregate(list_transform(range(1, len(sc) + 1), i -> sc_desc[i] *
          CASE WHEN i = 1 THEN pow(1.0 - {a}, len(sc) - 1)
               ELSE {a} * pow(1.0 - {a}, len(sc) - i) END), 'sum')
 FROM (SELECT sc, list_sort(sc, 'DESC') AS sc_desc FROM (SELECT {scores} AS sc)))"""


def span_token_scores_col(span_probs: Column, labels: Column) -> Column:
    """Span-classification per-token quality scores
    (experimental/span_classification.py:19-106): the single-span-class
    probability p becomes token pred_probs [1-p, p]
    (_get_pred_prob_token), and the per-token score is the
    self-confidence of the given binary label — p when the token is
    labeled in-span, 1-p otherwise.

    Ragged inputs (len(labels) != len(span_probs) — malformed
    annotations) resolve to len(span_probs) scores with missing labels
    treated as 0, matching the SQL twin exactly (zip_with would instead
    pad to the LONGER array with NULLs — a twin divergence)."""
    return F.transform(
        span_probs,
        lambda p, i: F.when(
            F.try_element_at(labels, i + F.lit(1)) == F.lit(1), p
        ).otherwise(F.lit(1.0) - p),
    )


def span_token_scores_sql(span_probs: str, labels: str) -> str:
    return (
        f"list_transform(range(1, len({span_probs}) + 1), "
        f"i -> CASE WHEN {labels}[i] = 1 THEN {span_probs}[i] "
        f"ELSE 1.0 - {span_probs}[i] END)"
    )


def span_sentence_score_col(
    span_probs: Column, labels: Column, temperature: float = 0.05
) -> Column:
    """Span-classification sentence score: softmin pool of the per-token
    scores — the reference's get_label_quality_scores delegation to
    token_classification/rank.py over the expanded [1-p, p] probs."""
    return softmin_col(span_token_scores_col(span_probs, labels), temperature)


def span_sentence_score_sql(
    span_probs: str, labels: str, temperature: float = 0.05
) -> str:
    return softmin_sql(span_token_scores_sql(span_probs, labels), temperature)


def filter_issues_by_token(issues, token: str, token_col: str = "token"):
    """Subset of token label issues involving a particular token —
    token_classification/summary.py:302-345 semantics (case-insensitive
    equality), as a pure predicate over the issue frame (which carries
    the token string, so no join back to the sentence table is needed)."""
    return issues.where(_ascii_lower_col(F.col(token_col)) == _ascii_lower_py(token))


def filter_issues_by_token_sql(token: str, token_col: str = "token") -> str:
    """DuckDB twin predicate of :func:`filter_issues_by_token`."""
    escaped = _ascii_lower_py(token).replace("'", "''")
    return f"({_ascii_lower_sql(token_col)} = '{escaped}')"
