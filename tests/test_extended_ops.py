"""Pooling / multiannotator / datalab / task-score parity tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import ref_impl as R
from conftest import probs_df
from sparkclean.quality import datalab, multiannotator, pooling, task_scores


def _softmin_ref(scores, t=0.05):
    s = np.asarray(scores, dtype=float)
    z = (1 - s) / t
    w = np.exp(z - z.max())
    return float(np.dot(s, w / w.sum()))


def _ema_ref(scores, alpha=None):
    s = np.sort(np.asarray(scores, dtype=float))[::-1]
    k = len(s)
    if alpha is None:
        alpha = 2.0 / (k + 1)
    ema = s[0]
    for x in s[1:]:
        ema = alpha * x + (1 - alpha) * ema
    return float(ema)


def test_softmin_matches_reference_example(spark):
    # token_classification/rank.py docstring example values
    cases = [[0.9, 0.6], [0.0, 0.8, 0.8], [0.8]]
    expected = [6.00741787e-01, 1.80056239e-07, 8.00000000e-01]
    df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cases)],
        "id: int, scores: array<double>",
    )
    got = {
        r["id"]: r["s"]
        for r in df.select("id", pooling.softmin_col(F.col("scores")).alias("s")).collect()
    }
    for i, e in enumerate(expected):
        assert abs(got[i] - e) < 1e-8
        assert abs(got[i] - _softmin_ref(cases[i])) < 1e-12


def test_ema_matches_reference_example(spark):
    # multilabel_scorer.py docstring: EMA([0.1,0.2,0.3], alpha=0.5) = 0.175
    df = spark.createDataFrame([(0, [0.1, 0.2, 0.3])], "id: int, s: array<double>")
    got = df.select(pooling.ema_col(F.col("s"), alpha=0.5).alias("e")).collect()[0]["e"]
    assert abs(got - 0.175) < 1e-12

    rng = np.random.RandomState(3)
    cases = [list(rng.rand(k)) for k in (2, 3, 5, 8)]
    df2 = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cases)],
        "id: int, s: array<double>",
    )
    got2 = {
        r["id"]: r["e"] for r in df2.select("id", pooling.ema_col(F.col("s")).alias("e")).collect()
    }
    for i, c in enumerate(cases):
        assert abs(got2[i] - _ema_ref(c)) < 1e-12


def test_majority_vote_with_tiebreaks(spark):
    # example 0: clear majority (1). example 1: tie 0 vs 2 → pred_probs
    # favour 2. example 2: tie 1 vs 2, equal probs → lower class_freq wins.
    long_rows = [
        (0, "a", 1), (0, "b", 1), (0, "c", 0),
        (1, "a", 0), (1, "b", 2),
        (2, "a", 1), (2, "b", 2),
    ]
    long_df = spark.createDataFrame(long_rows, "example_id: long, annotator_id: string, label: int")
    probs = spark.createDataFrame(
        [
            (0, [0.2, 0.6, 0.2]),
            (1, [0.3, 0.1, 0.6]),
            (2, [0.4, 0.3, 0.3]),
        ],
        "example_id: long, pred_probs: array<double>",
    )
    got = {
        r["example_id"]: r["consensus_label"]
        for r in multiannotator.majority_vote_label(long_df, probs).collect()
    }
    assert got[0] == 1
    assert got[1] == 2
    # class freqs: label 1 appears 3×, label 2 2× → lowest freq wins → 2
    assert got[2] == 2

    stats = {
        r["annotator_id"]: r
        for r in multiannotator.annotator_stats(
            long_df, multiannotator.majority_vote_label(long_df, probs)
        ).collect()
    }
    assert stats["a"]["num_labeled"] == 3
    assert 0.0 <= stats["a"]["agreement"] <= 1.0

    cq = multiannotator.consensus_quality(long_df, probs).collect()
    for r in cq:
        assert 0.0 <= r["consensus_quality_score"] <= 1.0


def test_datalab_find_issues(spark):
    labels, probs, _ = R.make_noisy_fixture(n=300, k=3, seed=5)
    df = probs_df(spark, labels, probs).withColumn("cluster", F.col("label") % 2)
    issues, summary = datalab.find_issues(
        df, 3, id_col="id", cluster_col="cluster", null_cols=["pred_probs"]
    )
    cols = issues.columns
    for c in [
        "is_label_issue", "label_score", "is_outlier_issue", "outlier_score",
        "is_class_imbalance_issue", "class_imbalance_score",
        "is_null_issue", "null_score",
        "is_underperforming_group_issue", "underperforming_group_score",
    ]:
        assert c in cols, c
    assert issues.count() == 300
    srows = {r["issue_type"]: r for r in summary.collect()}
    assert srows["label"]["num_issues"] > 0
    # ~10% quantile flagging
    assert 0 < srows["outlier"]["num_issues"] <= 60
    assert srows["null"]["num_issues"] == 0


def test_task_scores(spark):
    df = spark.createDataFrame(
        [(0, 5.0, 4.5), (1, 2.0, 2.0), (2, 10.0, 7.0)], "id: int, y: double, pred: double"
    )
    got = {
        r["id"]: r["s"]
        for r in df.select(
            "id", task_scores.regression_residual_score(F.col("y"), F.col("pred")).alias("s")
        ).collect()
    }
    assert abs(got[0] - np.exp(-0.5)) < 1e-12
    assert got[1] == 1.0

    ml = spark.createDataFrame(
        [(0, [0.9, 0.2, 0.7], [0, 2]), (1, [0.1, 0.8, 0.3], [1])],
        "id: int, pred_probs: array<double>, given: array<int>",
    )
    out = {
        r["id"]: (r["cls"], r["q"])
        for r in ml.select(
            "id",
            task_scores.multilabel_class_scores(F.col("pred_probs"), F.col("given")).alias("cls"),
            task_scores.multilabel_quality_score(F.col("pred_probs"), F.col("given")).alias("q"),
        ).collect()
    }
    np.testing.assert_allclose(out[0][0], [0.9, 0.8, 0.7])
    np.testing.assert_allclose(out[1][0], [0.9, 0.8, 0.7])
    assert abs(out[0][1] - _ema_ref([0.9, 0.8, 0.7])) < 1e-12
