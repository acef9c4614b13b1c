"""Pass-1 of the confident-learning dataflow: per-class confident thresholds.

t_k = mean(pred_probs[:, k] | label == k)  (count.py:1407-1458)

This is a single map-side-combinable groupBy — the Spark analog of the
streaming weighted-mean update in label_issues_batched.py:487-516, and it
is order/partitioning-invariant up to float addition order (see SURVEY §7
tolerance analysis).  Missing classes get threshold 2.0 so no probability
can ever reach them; all thresholds are clipped to >= 2e-6.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import CONFIDENT_THRESHOLDS_LOWER_BOUND, MISSING_CLASS_THRESHOLD
from .scores import self_confidence


def get_confident_thresholds(
    df: DataFrame,
    num_classes: int,
    label_col: str = "label",
    probs_col: str = "pred_probs",
) -> list[float]:
    """Distributed per-class mean self-confidence, collected as a K-vector.

    One shuffle of K rows; the aggregation is partial (map-side combine) so
    the exchange carries only (label, sum, count) per partition — safe at
    any N.
    """
    rows = (
        df.groupBy(F.col(label_col).cast("int").alias("_k"))
        .agg(F.avg(self_confidence(F.col(label_col), F.col(probs_col))).alias("_t"))
        .collect()
    )
    t = np.full(num_classes, MISSING_CLASS_THRESHOLD, dtype=float)
    for r in rows:
        if r["_k"] is not None and 0 <= r["_k"] < num_classes:
            t[r["_k"]] = r["_t"]
    t = np.clip(t, CONFIDENT_THRESHOLDS_LOWER_BOUND, None)
    return [float(x) for x in t]
